"""Pure-numpy oracles: the "CPU reference" of BASELINE.json's numeric gate.

These transparent implementations stand in for the unreadable reference repo
(mount empty — SURVEY.md §0): CTC forward-backward, prefix beam search,
LSTM step math, and MFCC feature formulas.  Every on-device implementation
in the package is allclose-tested against these.
"""

"""neuralasr_tpu — a TPU-native end-to-end ASR framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of the
reference CTC speech recognizer (zeahmed/NeuralASR; see SURVEY.md — the
reference mount was empty, so BASELINE.json's north_star is the binding
capability contract).

Pipeline: audio -> framing/STFT/log-mel/MFCC (on-device, MXU DFT-by-matmul
with an optional Pallas fused frontend) -> BiLSTM / Conv2d-subsample /
Conformer encoder (flax, lax.scan, Pallas attention) -> CTC loss
(length-masked log-space scan) -> greedy / vectorized beam-search decoding
(optionally with n-gram LM shallow fusion) -> WER metrics.

Distribution: jax.sharding Mesh ('data', 'model') + jit/GSPMD; no
hand-written collectives in application code.
"""

__version__ = "0.1.0"

"""CTC loss and decoders, TPU-native.

The reference's CTC machinery is TF C++ kernels (`ctc_loss_calculator.h`,
`ctc_beam_search.h`; SURVEY.md §3).  Here loss and decoders are JAX programs
that live in the same jit'd computation as the encoder — no host round-trip
(the reference's notorious TF-1.x CPU ctc_loss round-trip, SURVEY.md §4.2,
is designed out).
"""

from .loss import ctc_loss
from .greedy import greedy_decode
from .beam import beam_search_decode

__all__ = ["ctc_loss", "greedy_decode", "beam_search_decode"]

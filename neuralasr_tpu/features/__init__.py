"""On-device audio feature extraction (framing / STFT / log-mel / MFCC).

The reference extracts features on host with numpy/`python_speech_features`
(SURVEY.md §2 L2, §4.1).  Here the whole pipeline is a jitted on-device
program shaped for the MXU: framing is a gather, the 512-point rFFT is a
DFT-by-matmul (for these sizes a dense [400, 2*257] matmul on the systolic
array beats butterfly FFTs, which XLA cannot tile onto the MXU), and
mel / DCT are further matmuls.  A fused Pallas frontend kernel is the
speed-of-light path (features/pallas_frontend.py).

Numeric parity: neuralasr_tpu/reference/mfcc_oracle.py, tests/test_features.py.
"""

from .frontend import FeatureConfig, make_frontend, num_frames

__all__ = ["FeatureConfig", "make_frontend", "num_frames"]

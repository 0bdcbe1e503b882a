"""Acoustic encoders (flax): BiLSTM stack, Conv2d subsampling, Conformer.

The reference's encoder is `tf.nn.bidirectional_dynamic_rnn(LSTMCell)` whose
math lives in TF C++ Eigen kernels (SURVEY.md §3).  Here the recurrence is a
`jax.lax.scan` whose per-step work is a single fused [B,H]x[H,4H] MXU
matmul; the input projection for the whole sequence is hoisted out of the
scan as one [B*T,D]x[D,4H] matmul.  Cell equations pinned by
reference/lstm_oracle.py.
"""

from .bilstm import BiLSTMEncoder, reverse_padded
from .conv_subsample import Conv2dSubsample
from .encoder import CTCModel

__all__ = ["BiLSTMEncoder", "Conv2dSubsample", "CTCModel", "reverse_padded"]

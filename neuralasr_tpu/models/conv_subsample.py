"""Conv2d time-subsampling front-end (config 3+; SURVEY.md §1).

Two stride-2 Conv2d+ReLU blocks over (time, freq) give 4x time reduction —
the framework's answer to long utterances (SURVEY.md §6 long-context: no
sequence parallelism needed at ASR lengths).  Convs map directly onto the
MXU via XLA's conv-to-matmul lowering; channels kept multiples of 8.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn


def subsampled_len(lens, num_blocks: int = 2):
    """Frame count after `num_blocks` stride-2 'SAME' convs: ceil(n / 2^k)."""
    out = lens
    for _ in range(num_blocks):
        out = (out + 1) // 2
    return out


class Conv2dSubsample(nn.Module):
    """[B, T, F] -> [B, ceil(T/4), out_dim]; lengths via subsampled_len."""

    channels: int = 32
    out_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, lens: jnp.ndarray):
        B, T, F = x.shape
        h = x[:, :, :, None].astype(self.dtype)  # [B, T, F, 1]
        for i in range(2):
            h = nn.Conv(
                self.channels,
                kernel_size=(3, 3),
                strides=(2, 2),
                padding="SAME",
                dtype=self.dtype,
                name=f"conv_{i}",
            )(h)
            h = nn.relu(h)
        Bt, Tt, Ft, Ct = h.shape
        h = h.reshape(Bt, Tt, Ft * Ct)
        h = nn.Dense(self.out_dim, dtype=self.dtype, name="proj")(h)
        new_lens = subsampled_len(lens).astype(jnp.int32)
        mask = (
            jnp.arange(Tt)[None, :] < new_lens[:, None]
        )[:, :, None].astype(h.dtype)
        return h * mask, new_lens

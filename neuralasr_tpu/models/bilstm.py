"""BiLSTM encoder as MXU-shaped scans.

TPU-first layout (not a port of TF's per-timestep Eigen kernels):

- The input projection x @ Wx + b for ALL timesteps is one big matmul
  hoisted out of the recurrence — the scan body touches only the [H, 4H]
  recurrent matmul plus VPU gate math.
- Gates are fused into a single 4H matrix, order (i, g, f, o), equations
  pinned by neuralasr_tpu/reference/lstm_oracle.py.
- The backward direction reverses *within each utterance's true length*
  (gather-based `reverse_padded`), the classic parity bug vs padded flips
  called out in SURVEY.md §8.
- Weights can be sharded over a 'model' mesh axis: Wx/Wh are partitioned on
  the 4H output dim via logical axis annotations (parallel/partition.py).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn


def reverse_padded(x: jnp.ndarray, lens: jnp.ndarray) -> jnp.ndarray:
    """Reverse [B, T, ...] along time within true lengths; padding positions
    keep their own (garbage, later-masked) values. Involution: applying it
    twice restores the input."""
    T = x.shape[1]
    t = jnp.arange(T)[None, :]
    idx = lens[:, None] - 1 - t
    idx = jnp.where(idx >= 0, idx, t)
    return jnp.take_along_axis(x, idx[:, :, None], axis=1)


class LSTMLayer(nn.Module):
    """Unidirectional LSTM over [B, T, D] -> [B, T, H]."""

    hidden: int
    dtype: Any = jnp.float32
    scan_unroll: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, T, D = x.shape
        H = self.hidden
        wx = self.param(
            "wx",
            nn.with_logical_partitioning(
                nn.initializers.glorot_uniform(), ("embed", "gates")
            ),
            (D, 4 * H),
        )
        wh = self.param(
            "wh",
            nn.with_logical_partitioning(
                nn.initializers.orthogonal(), ("hidden", "gates")
            ),
            (H, 4 * H),
        )
        b = self.param(
            "b",
            nn.with_logical_partitioning(
                nn.initializers.zeros_init(), ("gates",)
            ),
            (4 * H,),
        )

        # Hoisted input projection: one [B*T, D] x [D, 4H] MXU matmul.
        xp = (x.astype(self.dtype) @ wx.astype(self.dtype)) + b.astype(
            self.dtype
        )
        xp = jnp.transpose(xp, (1, 0, 2))  # [T, B, 4H] time-major for scan

        wh_c = wh.astype(self.dtype)

        def step(carry, xp_t):
            h, c = carry
            z = xp_t + h @ wh_c  # [B, 4H]
            i = jax.nn.sigmoid(z[:, 0 * H : 1 * H])
            g = jnp.tanh(z[:, 1 * H : 2 * H])
            f = jax.nn.sigmoid(z[:, 2 * H : 3 * H])
            o = jax.nn.sigmoid(z[:, 3 * H : 4 * H])
            c_new = f * c + i * g
            h_new = o * jnp.tanh(c_new)
            return (h_new, c_new), h_new

        h0 = jnp.zeros((B, H), dtype=self.dtype)
        (_, _), hs = jax.lax.scan(
            step, (h0, h0), xp, unroll=self.scan_unroll
        )
        return jnp.transpose(hs, (1, 0, 2))  # [B, T, H]


class BiLSTMEncoder(nn.Module):
    """N-layer BiLSTM: per layer concat(fwd(x), rev(bwd(rev(x)))) -> [B,T,2H].

    Outputs at padded positions are zeroed so downstream layers see clean
    activations regardless of padding content.
    """

    num_layers: int
    hidden: int
    dtype: Any = jnp.float32
    scan_unroll: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray, lens: jnp.ndarray) -> jnp.ndarray:
        mask = (
            jnp.arange(x.shape[1])[None, :] < lens[:, None]
        )[:, :, None].astype(x.dtype)
        h = x
        for layer in range(self.num_layers):
            fwd = LSTMLayer(
                self.hidden,
                dtype=self.dtype,
                scan_unroll=self.scan_unroll,
                name=f"fwd_{layer}",
            )(h)
            rev_in = reverse_padded(h, lens)
            bwd = LSTMLayer(
                self.hidden,
                dtype=self.dtype,
                scan_unroll=self.scan_unroll,
                name=f"bwd_{layer}",
            )(rev_in)
            bwd = reverse_padded(bwd, lens)
            h = jnp.concatenate([fwd, bwd], axis=-1) * mask
        return h

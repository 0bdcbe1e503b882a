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


class FusedBiLSTMLayer(nn.Module):
    """Both directions of one BiLSTM layer in a SINGLE `lax.scan`.

    The round-2 profile showed the BiLSTM family latency-bound on its
    sequential scans (mfu 0.087, unroll plateaued — BASELINE.md); running
    fwd and bwd as two scans per layer doubles the number of sequential
    step dispatches for no reason.  Here the carry is [2, B, H] (direction-
    major) and each step does one batched einsum against the [2, H, 4H]
    recurrent weights — half the sequential steps per layer, double the
    work per step (VERDICT r2 item 3).  Direction weights stay independent
    (slices of the stacked params), so the math is identical to two
    LSTMLayers; tests/test_bilstm_parity.py asserts exact equality.
    """

    hidden: int
    dtype: Any = jnp.float32
    scan_unroll: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray, lens: jnp.ndarray) -> jnp.ndarray:
        B, T, D = x.shape
        H = self.hidden
        wx = self.param(
            "wx",
            nn.with_logical_partitioning(
                nn.initializers.glorot_uniform(batch_axis=(0,)),
                ("direction", "embed", "gates"),
            ),
            (2, D, 4 * H),
        )
        wh = self.param(
            "wh",
            nn.with_logical_partitioning(
                _stacked_orthogonal, ("direction", "hidden", "gates")
            ),
            (2, H, 4 * H),
        )
        b = self.param(
            "b",
            nn.with_logical_partitioning(
                nn.initializers.zeros_init(), ("direction", "gates")
            ),
            (2, 4 * H),
        )

        xs = jnp.stack([x, reverse_padded(x, lens)], axis=0)  # [2, B, T, D]
        xp = (
            jnp.einsum(
                "dbtf,dfg->tdbg",
                xs.astype(self.dtype),
                wx.astype(self.dtype),
            )
            + b.astype(self.dtype)[None, :, None, :]
        )  # [T, 2, B, 4H]
        wh_c = wh.astype(self.dtype)

        def step(carry, xp_t):
            h, c = carry  # [2, B, H] each
            z = xp_t + jnp.einsum("dbh,dhg->dbg", h, wh_c)
            i = jax.nn.sigmoid(z[..., 0 * H : 1 * H])
            g = jnp.tanh(z[..., 1 * H : 2 * H])
            f = jax.nn.sigmoid(z[..., 2 * H : 3 * H])
            o = jax.nn.sigmoid(z[..., 3 * H : 4 * H])
            c_new = f * c + i * g
            h_new = o * jnp.tanh(c_new)
            return (h_new, c_new), h_new

        h0 = jnp.zeros((2, B, H), dtype=self.dtype)
        (_, _), hs = jax.lax.scan(step, (h0, h0), xp, unroll=self.scan_unroll)
        fwd = jnp.transpose(hs[:, 0], (1, 0, 2))  # [B, T, H]
        bwd = reverse_padded(jnp.transpose(hs[:, 1], (1, 0, 2)), lens)
        return jnp.concatenate([fwd, bwd], axis=-1)  # [B, T, 2H]


def _stacked_orthogonal(key, shape, dtype=jnp.float32):
    """Per-direction orthogonal init for stacked [2, H, 4H] weights."""
    k0, k1 = jax.random.split(key)
    init = nn.initializers.orthogonal()
    return jnp.stack(
        [init(k0, shape[1:], dtype), init(k1, shape[1:], dtype)], axis=0
    )


class BiLSTMEncoder(nn.Module):
    """N-layer BiLSTM: per layer concat(fwd(x), rev(bwd(rev(x)))) -> [B,T,2H].

    Outputs at padded positions are zeroed so downstream layers see clean
    activations regardless of padding content.  `fused_scan` runs both
    directions of each layer in one scan (FusedBiLSTMLayer) — same math,
    half the sequential step dispatches.
    """

    num_layers: int
    hidden: int
    dtype: Any = jnp.float32
    scan_unroll: int = 8
    fused_scan: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, lens: jnp.ndarray) -> jnp.ndarray:
        mask = (
            jnp.arange(x.shape[1])[None, :] < lens[:, None]
        )[:, :, None].astype(x.dtype)
        h = x
        for layer in range(self.num_layers):
            if self.fused_scan:
                h = (
                    FusedBiLSTMLayer(
                        self.hidden,
                        dtype=self.dtype,
                        scan_unroll=self.scan_unroll,
                        name=f"bi_{layer}",
                    )(h, lens)
                    * mask
                )
                continue
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

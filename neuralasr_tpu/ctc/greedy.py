"""Greedy (best-path) CTC decode, fully on-device.

The reference calls TF's C++ `ctc_greedy_decoder` (SURVEY.md §3); here it is
three fused VPU ops — argmax, repeat-collapse mask, and a stable compaction
— with fixed output shape [B, T] + lengths, jit/vmap/pjit-friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def greedy_decode(
    logits: jnp.ndarray,  # [B, T, V]
    input_lens: jnp.ndarray,  # [B]
    blank_id: int = 0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (ids [B, T] left-packed and blank-padded, lengths [B])."""
    B, T, V = logits.shape
    path = jnp.argmax(logits, axis=-1)  # [B, T]
    t_idx = jnp.arange(T)[None, :]
    valid = t_idx < input_lens[:, None]

    prev = jnp.concatenate(
        [jnp.full((B, 1), -1, dtype=path.dtype), path[:, :-1]], axis=1
    )
    keep = (path != prev) & (path != blank_id) & valid  # [B, T]

    # Stable left-compaction via argsort+gather (scatter-free: batched 2-D
    # scatters deadlock XLA:CPU on some hosts): kept symbols sort first in
    # time order, dropped ones after.
    lengths = keep.sum(axis=1).astype(jnp.int32)
    key = jnp.where(keep, t_idx, t_idx + T)  # [B, T]
    order = jnp.argsort(key, axis=1)  # stable
    gathered = jnp.take_along_axis(path, order, axis=1)
    j_idx = jnp.arange(T)[None, :]
    out = jnp.where(j_idx < lengths[:, None], gathered, blank_id)
    return out.astype(jnp.int32), lengths

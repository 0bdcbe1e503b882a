"""SpecAugment (Park et al. 2019) as pure jnp masking — config 3+.

Not in the 2017-era reference (spec-mandated growth, SURVEY.md §1).  All
masks are built from broadcasted iota + uniform draws: static shapes, no
dynamic slicing, fuses into the feature pipeline under jit.  Time masks are
sized relative to each utterance's true length.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def specaugment(
    rng: jax.Array,
    feats: jnp.ndarray,  # [B, T, F]
    feat_lens: jnp.ndarray,  # [B]
    freq_mask: int = 10,
    time_mask: int = 20,
    num_freq_masks: int = 1,
    num_time_masks: int = 2,
) -> jnp.ndarray:
    B, T, F = feats.shape
    t_idx = jnp.arange(T)[None, :]  # [1, T]
    f_idx = jnp.arange(F)[None, :]  # [1, F]

    def apply_masks(feats, rng, n_masks, width, axis_idx, limit):
        for k in range(n_masks):
            rng, r1, r2 = jax.random.split(rng, 3)
            w = jax.random.randint(r1, (B,), 0, width + 1)  # [B]
            w = jnp.minimum(w, limit // 5)  # short rows keep >= ~4/5 content
            start = (
                jax.random.uniform(r2, (B,))
                * jnp.maximum(limit - w, 1).astype(jnp.float32)
            ).astype(jnp.int32)
            mask = (axis_idx >= start[:, None]) & (
                axis_idx < (start + w)[:, None]
            )  # [B, axis]
            if axis_idx.shape[-1] == T:
                feats = jnp.where(mask[:, :, None], 0.0, feats)
            else:
                feats = jnp.where(mask[:, None, :], 0.0, feats)
        return feats

    rng_t, rng_f = jax.random.split(rng)
    feats = apply_masks(
        feats, rng_f, num_freq_masks, freq_mask, f_idx, jnp.full((B,), F)
    )
    # Time-mask width capped at time_mask but also at len/5 so short
    # utterances keep most frames.
    feats = apply_masks(
        feats, rng_t, num_time_masks, time_mask, t_idx, feat_lens
    )
    return feats

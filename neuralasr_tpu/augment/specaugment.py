"""SpecAugment (Park et al. 2019) as pure jnp masking — config 3+.

Not in the 2017-era reference (spec-mandated growth, SURVEY.md §1).  All
masks are built from broadcasted iota + uniform draws: static shapes, no
dynamic slicing, fuses into the feature pipeline under jit.  Time masks are
sized relative to each utterance's true length.

Time masks fill with unit-Gaussian noise (the CMVN'd feature scale), not
zeros.  An exactly-zero frame stays exactly zero through the zero-bias conv
subsample at init, so every conformer block's LayerNorm sees a zero-variance
row; the backward multiplies ~1/sqrt(eps)=1e3 per block and a 12-block stack
produces ~1e36 gradients that overflow f32 on TPU (observed as
grad_norm=Infinity).  Noise fill destroys the masked content just the same
while keeping LayerNorm non-degenerate.  Frequency masks zero single
columns — cross-feature variance survives — so they keep the standard
zero fill.
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
    time_mask_noise: float = 1.0,
) -> jnp.ndarray:
    B, T, F = feats.shape
    t_idx = jnp.arange(T)[None, :]  # [1, T]
    f_idx = jnp.arange(F)[None, :]  # [1, F]

    def draw_mask(rng, n_masks, width, axis_idx, limit):
        mask = jnp.zeros((B, axis_idx.shape[-1]), bool)
        for _ in range(n_masks):
            rng, r1, r2 = jax.random.split(rng, 3)
            w = jax.random.randint(r1, (B,), 0, width + 1)  # [B]
            w = jnp.minimum(w, limit // 5)  # short rows keep >= ~4/5 content
            start = (
                jax.random.uniform(r2, (B,))
                * jnp.maximum(limit - w, 1).astype(jnp.float32)
            ).astype(jnp.int32)
            mask |= (axis_idx >= start[:, None]) & (
                axis_idx < (start + w)[:, None]
            )
        return mask

    rng_t, rng_f, rng_n = jax.random.split(rng, 3)
    fmask = draw_mask(rng_f, num_freq_masks, freq_mask, f_idx, jnp.full((B,), F))
    feats = jnp.where(fmask[:, None, :], 0.0, feats)
    # Time-mask width capped at time_mask but also at len/5 so short
    # utterances keep most frames.
    tmask = draw_mask(rng_t, num_time_masks, time_mask, t_idx, feat_lens)
    if time_mask_noise > 0.0:
        fill = jax.random.normal(rng_n, feats.shape, feats.dtype) * time_mask_noise
    else:
        fill = jnp.zeros_like(feats)
    return jnp.where(tmask[:, :, None], fill, feats)

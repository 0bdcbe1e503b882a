"""SpecAugment masking properties (config 3 capability, SURVEY.md §1)."""

import numpy as np
import jax
import jax.numpy as jnp

from neuralasr_tpu.augment.specaugment import specaugment


def _apply(seed=0, B=4, T=100, F=80, **kw):
    rng = jax.random.PRNGKey(seed)
    feats = jnp.ones((B, T, F))
    lens = jnp.asarray([100, 60, 30, 10], jnp.int32)
    out = specaugment(rng, feats, lens, **kw)
    return np.asarray(out), np.asarray(lens)


def test_masks_regions_and_preserve_shape():
    out, lens = _apply(freq_mask=10, time_mask=20)
    assert out.shape == (4, 100, 80)
    assert (out != 1).any(), "no masking applied"


def test_freq_masks_zero_columns():
    out, _ = _apply(freq_mask=20, time_mask=0, num_time_masks=0)
    assert ((out == 0) | (out == 1)).all(), "freq masking must only zero"
    zero_cols = (out == 0).all(axis=1)  # [B, F] columns zeroed over all T
    assert zero_cols.any(), "no frequency column masked"


def test_time_masks_fill_with_noise_not_zero():
    # Exactly-zero masked frames make downstream LayerNorms degenerate
    # (zero variance -> ~1e36 grads over 12 blocks, inf on TPU f32); time
    # masks must therefore fill with noise, never exact zeros.
    out, lens = _apply(freq_mask=0, num_freq_masks=0, time_mask=50)
    masked = out != 1
    assert masked.any(), "no time masking applied"
    assert not (out[masked] == 0).all(), "time mask fill is all-zero"
    # Noise fill at unit scale: masked cells vary.
    assert np.std(out[masked]) > 0.1


def test_time_masks_zero_fill_opt_in():
    out, _ = _apply(freq_mask=0, num_freq_masks=0, time_mask=50,
                    time_mask_noise=0.0)
    assert ((out == 0) | (out == 1)).all()


def test_time_masks_stay_within_true_length():
    # Padding region (t >= len) must be untouched (stays 1.0).
    out, lens = _apply(freq_mask=0, num_freq_masks=0, time_mask=50)
    for b, n in enumerate(lens):
        pad = out[b, n:, :]
        assert (pad == 1).all(), f"row {b}: mask leaked into padding"


def test_time_mask_width_capped_by_length():
    # With the len//5 cap, a row of length 10 loses at most 2*2 frames.
    out, lens = _apply(freq_mask=0, num_freq_masks=0, time_mask=50,
                       num_time_masks=2)
    b = 3  # len 10
    masked = int((out[b, :10, 0] != 1).sum())
    assert masked <= 4, f"cap violated: {masked} frames masked of 10"


def test_deterministic_given_rng():
    a, _ = _apply(seed=7)
    b, _ = _apply(seed=7)
    np.testing.assert_array_equal(a, b)
    c, _ = _apply(seed=8)
    assert not np.array_equal(a, c)

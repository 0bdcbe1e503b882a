"""Conformer encoder + Pallas attention parity tests."""

import numpy as np
import jax
import jax.numpy as jnp

from neuralasr_tpu.models.encoder import CTCModel, ModelConfig
from neuralasr_tpu.ops.pallas_attention import flash_attention, _attention_ref


def test_pallas_attention_matches_reference():
    rng = np.random.default_rng(0)
    B, T, H, D = 2, 50, 4, 16
    q = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    lens = jnp.asarray([50, 23], dtype=jnp.int32)
    got = flash_attention(q, k, v, lens)
    want = _attention_ref(q, k, v, lens)
    # Padded query rows are ignored downstream; compare valid rows.
    for b, n in enumerate([50, 23]):
        np.testing.assert_allclose(
            np.asarray(got)[b, :n], np.asarray(want)[b, :n],
            rtol=2e-4, atol=2e-4,
        )


def test_pallas_attention_grad_matches_reference():
    rng = np.random.default_rng(1)
    B, T, H, D = 1, 20, 2, 8
    q = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    lens = jnp.asarray([15], dtype=jnp.int32)
    mask = (jnp.arange(T)[None, :] < lens[:, None]).astype(jnp.float32)

    def f_pallas(q, k, v):
        return (flash_attention(q, k, v, lens) * mask[:, :, None, None]).sum()

    def f_ref(q, k, v):
        return (_attention_ref(q, k, v, lens) * mask[:, :, None, None]).sum()

    g1 = jax.grad(f_pallas, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_conformer_forward_shapes_and_mask():
    cfg = ModelConfig(
        encoder_type="conformer",
        num_layers=2,
        hidden=64,
        num_heads=4,
        conv_subsample=True,
        conv_out_dim=64,
    )
    model = CTCModel(cfg)
    B, T, F = 2, 40, 80
    rng = np.random.default_rng(2)
    feats = jnp.asarray(rng.normal(size=(B, T, F)).astype(np.float32))
    lens = jnp.asarray([40, 17], dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), feats, lens)["params"]
    logits, out_lens = model.apply({"params": params}, feats, lens)
    assert logits.shape == (B, 10, 29)  # T/4 via two stride-2 convs
    assert list(np.asarray(out_lens)) == [10, 5]
    assert np.isfinite(np.asarray(logits)).all()


def test_conformer_padding_invariance():
    # Same utterance, two padded lengths -> identical valid-frame logits.
    cfg = ModelConfig(
        encoder_type="conformer", num_layers=2, hidden=64, num_heads=4
    )
    model = CTCModel(cfg)
    rng = np.random.default_rng(3)
    T1, T2, F = 24, 40, 32
    x = rng.normal(size=(1, T1, F)).astype(np.float32)
    xa = jnp.asarray(x)
    xb = jnp.zeros((1, T2, F), jnp.float32).at[:, :T1].set(x)
    lens = jnp.asarray([T1], dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), xa, lens)["params"]
    la, _ = model.apply({"params": params}, xa, lens)
    lb, _ = model.apply({"params": params}, xb, lens)
    np.testing.assert_allclose(
        np.asarray(la)[0], np.asarray(lb)[0, :T1], rtol=1e-4, atol=1e-4
    )

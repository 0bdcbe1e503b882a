"""Conformer encoder + Pallas attention parity tests."""

import numpy as np
import jax
import jax.numpy as jnp

from neuralasr_tpu.models.encoder import CTCModel, ModelConfig
from neuralasr_tpu.ops.pallas_attention import (
    _attention_ref as _attention_ref_tab,
    flash_attention,
    identity_tables,
)


def _attention_ref(q, k, v, lens):
    return _attention_ref_tab(
        q, k, v, lens, *identity_tables(q.shape[1], q.shape[3])
    )


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


def test_deep_conformer_overfits_toy_batch():
    """Regression: a DEEP conformer stack must escape the all-blank CTC
    optimum. Before zero-init residual output projections
    (models/conformer.py::_dense), 12 blocks plateaued at loss ~50 on a
    single batch while 2 blocks reached ~0; 8 small blocks reproduce the
    failure mode on CPU in seconds."""
    import optax
    from neuralasr_tpu.ctc.loss import ctc_loss

    cfg = ModelConfig(
        encoder_type="conformer", num_layers=8, hidden=64, num_heads=4,
        ff_mult=2, conv_kernel=7, conv_subsample=False,
    )
    model = CTCModel(cfg)
    rng = np.random.default_rng(0)
    B, T, F = 4, 40, 16
    feats = jnp.asarray(rng.normal(size=(B, T, F)).astype(np.float32))
    feat_lens = jnp.asarray([40, 36, 40, 30], jnp.int32)
    labels = jnp.asarray(rng.integers(1, 29, size=(B, 8)), jnp.int32)
    label_lens = jnp.asarray([8, 6, 8, 5], jnp.int32)

    params = model.init(jax.random.PRNGKey(0), feats, feat_lens)["params"]
    tx = optax.adam(3e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits, out_lens = model.apply({"params": p}, feats, feat_lens)
            return ctc_loss(logits, labels, out_lens, label_lens).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    loss = None
    for _ in range(150):
        params, opt_state, loss = step(params, opt_state)
    assert float(loss) < 2.0, f"deep conformer stuck at loss {float(loss):.2f}"


def test_dropout_enabled_trains():
    """dropout > 0 needs the 'dropout' rng plumbed into model.apply —
    regression test for the missing-rng crash."""
    import dataclasses

    import numpy as np

    from neuralasr_tpu.configs import CONFIG1
    from neuralasr_tpu.training import Trainer

    cfg = dataclasses.replace(
        CONFIG1,
        num_utterances=16,
        batch_size=8,
        model=dataclasses.replace(
            CONFIG1.model,
            encoder_type="conformer",
            num_layers=1,
            hidden=64,
            num_heads=4,
            dropout=0.1,
        ),
    )
    tr = Trainer(cfg)
    batch = next(iter(tr.loader.epoch(0)))
    m = tr.train_batch(batch)
    assert np.isfinite(float(m["loss"]))


def test_attn_min_t_static_dispatch_and_parity():
    """pallas_attn_min_t is compile-time dispatch: programs with padded
    T below the threshold must contain no pallas_call (XLA attention),
    those at/above must contain one per block — and both paths agree
    numerically (the measured-policy change of BASELINE.md r3 cannot
    change model outputs)."""
    import dataclasses

    def build(min_t):
        cfg = ModelConfig(
            encoder_type="conformer",
            num_layers=2,
            hidden=64,
            num_heads=4,
            conv_subsample=True,
            conv_out_dim=64,
            use_pallas_attention=True,
            partition_attention=False,
            pallas_attn_min_t=min_t,
        )
        return CTCModel(cfg)

    B, T, F = 2, 40, 80  # 10 encoder frames after 4x subsample
    rng = np.random.default_rng(5)
    feats = jnp.asarray(rng.normal(size=(B, T, F)).astype(np.float32))
    lens = jnp.asarray([40, 17], dtype=jnp.int32)

    m_kernel = build(0)      # threshold 0: kernel always engages
    m_xla = build(512)       # 10 frames < 512: XLA attention
    params = m_kernel.init(jax.random.PRNGKey(0), feats, lens)["params"]

    jx_kernel = str(jax.make_jaxpr(
        lambda p: m_kernel.apply({"params": p}, feats, lens))(params))
    jx_xla = str(jax.make_jaxpr(
        lambda p: m_xla.apply({"params": p}, feats, lens))(params))
    assert "pallas_call" in jx_kernel
    assert "pallas_call" not in jx_xla

    lg_k, ol_k = m_kernel.apply({"params": params}, feats, lens)
    lg_x, ol_x = m_xla.apply({"params": params}, feats, lens)
    assert list(np.asarray(ol_k)) == list(np.asarray(ol_x))
    np.testing.assert_allclose(
        np.asarray(lg_k), np.asarray(lg_x), atol=2e-4, rtol=2e-4
    )


def test_dropout_identical_across_attention_paths():
    """ADVICE r3: the attn_min_t dispatch must not change TRAINING behavior
    under dropout>0.  Round 3 applied dropout to attention probs only on
    the XLA path; now both paths regularize identically (residual-branch
    dropout after proj), so same-rng outputs must match across paths."""
    import dataclasses

    def build(min_t):
        cfg = ModelConfig(
            encoder_type="conformer",
            num_layers=2,
            hidden=64,
            num_heads=4,
            use_pallas_attention=True,
            partition_attention=False,
            pallas_attn_min_t=min_t,
            dropout=0.3,
        )
        return CTCModel(cfg)

    B, T, F = 2, 24, 32
    rng = np.random.default_rng(9)
    feats = jnp.asarray(rng.normal(size=(B, T, F)).astype(np.float32))
    lens = jnp.asarray([24, 15], dtype=jnp.int32)
    m_kernel, m_xla = build(0), build(512)
    params = m_kernel.init(jax.random.PRNGKey(0), feats, lens)["params"]
    dr = {"dropout": jax.random.PRNGKey(7)}
    lg_k, _ = m_kernel.apply(
        {"params": params}, feats, lens, train=True, rngs=dr
    )
    lg_x, _ = m_xla.apply(
        {"params": params}, feats, lens, train=True, rngs=dr
    )
    np.testing.assert_allclose(
        np.asarray(lg_k), np.asarray(lg_x), atol=2e-4, rtol=2e-4
    )

"""Fused conv-module kernel: forward/backward parity vs the flax XLA
ConvModule (interpret mode on CPU; the same kernels compile on TPU —
bench.py --preflight exercises them there), plus the packed-attention
XLA layout (models/conformer.py MHSA attn_impl="packed")."""

import numpy as np

import jax
import jax.numpy as jnp

from neuralasr_tpu.models.conformer import ConvModule, MHSA
from neuralasr_tpu.ops import pallas_conv as pc


def _inputs(B=4, T=48, d=384, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, T, d)).astype(np.float32), dtype)
    lens = jnp.asarray(rng.integers(T // 2, T + 1, size=(B,)), jnp.int32)
    mask = jnp.arange(T)[None, :] < lens[:, None]
    return x, lens, mask


def _modules(dtype, d=384, K=15):
    xla = ConvModule(d, K, dtype=dtype, impl="xla")
    fused = ConvModule(d, K, dtype=dtype, impl="pallas")
    return xla, fused


def test_param_tree_identical_and_init_equal():
    """The fused path's _ParamBank must reproduce the XLA module's exact
    parameter names, shapes AND init values (same path -> same RNG fold),
    so checkpoints and ladders stay comparable across impls."""
    x, _, mask = _inputs()
    xla, fused = _modules(jnp.float32)
    p1 = xla.init(jax.random.PRNGKey(7), x, mask, False)["params"]
    p2 = fused.init(jax.random.PRNGKey(7), x, mask, False)["params"]
    f1 = jax.tree_util.tree_flatten_with_path(p1)
    f2 = jax.tree_util.tree_flatten_with_path(p2)
    assert [k for k, _ in f1[0]] == [k for k, _ in f2[0]]
    for (k, a), (_, b) in zip(f1[0], f2[0]):
        assert a.shape == b.shape, k
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), err_msg=str(k))


def test_forward_matches_xla_module_f32():
    x, _, mask = _inputs()
    xla, fused = _modules(jnp.float32)
    params = xla.init(jax.random.PRNGKey(0), x, mask, False)["params"]
    want = xla.apply({"params": params}, x, mask, False)
    got = fused.apply({"params": params}, x, mask, False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_forward_matches_xla_module_bf16():
    x, _, mask = _inputs(dtype=jnp.bfloat16)
    xla, fused = _modules(jnp.bfloat16)
    params = xla.init(jax.random.PRNGKey(1), x, mask, False)["params"]
    want = np.asarray(
        xla.apply({"params": params}, x, mask, False), np.float32
    )
    got = np.asarray(
        fused.apply({"params": params}, x, mask, False), np.float32
    )
    # bf16 stage-boundary rounding differs slightly (kernel keeps f32
    # between elementwise stages); bound vs the f32 truth instead of
    # bf16-vs-bf16 exactness.
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)


def test_backward_matches_xla_module_vjp():
    """dx and EVERY weight gradient (accumulated across the sequential
    grid in constant-index-map output blocks) must match the XLA VJP."""
    x, _, mask = _inputs(B=6, T=40)
    xla, fused = _modules(jnp.float32)
    params = xla.init(jax.random.PRNGKey(2), x, mask, False)["params"]
    g = jnp.asarray(
        np.random.default_rng(3).normal(size=x.shape).astype(np.float32)
    )

    def loss(mod):
        def f(p, xx):
            out = mod.apply({"params": p}, xx, mask, False)
            return (out * g).sum()

        return jax.grad(f, argnums=(0, 1))(params, x)

    gp_want, gx_want = loss(xla)
    gp_got, gx_got = loss(fused)
    np.testing.assert_allclose(
        np.asarray(gx_got), np.asarray(gx_want), rtol=2e-4, atol=2e-4
    )
    flat_w = jax.tree_util.tree_flatten_with_path(gp_want)[0]
    flat_g = jax.tree_util.tree_flatten_with_path(gp_got)[0]
    for (k, a), (_, b) in zip(flat_w, flat_g):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-4,
            err_msg=str(k),
        )


def test_ref_matches_xla_module():
    """The jnp fallback (_conv_ref, used past the VMEM budget and as the
    oracle) must itself equal the flax chain."""
    x, lens, mask = _inputs(seed=5)
    xla, _ = _modules(jnp.float32)
    params = xla.init(jax.random.PRNGKey(4), x, mask, False)["params"]
    want = xla.apply({"params": params}, x, mask, False)
    import flax.linen as nn

    p = nn.meta.unbox(params)
    got = pc._conv_ref(
        x, lens,
        p["LayerNorm_0"]["scale"], p["LayerNorm_0"]["bias"],
        p["pw_in"]["kernel"], p["pw_in"]["bias"],
        p["dw"]["kernel"].reshape(15, 384), p["dw"]["bias"],
        p["norm"]["scale"], p["norm"]["bias"],
        p["pw_out"]["kernel"], p["pw_out"]["bias"],
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_fallback_past_budget():
    """Shapes whose backward working set exceeds VMEM must route to the
    jnp reference, not an over-budget kernel."""
    assert pc._conv_plan(4, 48, 384, 4) is not None
    assert pc._conv_plan(4, 100_000, 384, 4) is None
    x, _, mask = _inputs(B=2, T=32)
    _, fused = _modules(jnp.float32)
    params = fused.init(jax.random.PRNGKey(0), x, mask, False)["params"]
    out = fused.apply({"params": params}, x, mask, False)
    assert np.isfinite(np.asarray(out)).all()


# ---------------- packed XLA attention layout ----------------


def _mhsa_pair(attn_impl, dtype=jnp.float32, d=384, H=6):
    base = MHSA(d, H, dtype=dtype, attn_impl="split")
    new = MHSA(d, H, dtype=dtype, attn_impl=attn_impl)
    return base, new


def test_attn_packed_matches_split_f32():
    """attn_impl='packed' (single [3,B,H,T,D] transpose, rotation-matmul
    rope, additive mask) must be numerically identical to the round-4
    'split' form — values AND grads."""
    rng = np.random.default_rng(0)
    B, T, d = 3, 40, 384
    x = jnp.asarray(rng.normal(size=(B, T, d)).astype(np.float32))
    lens = jnp.asarray([40, 17, 29], jnp.int32)
    mask = jnp.arange(T)[None, :] < lens[:, None]
    split, packed = _mhsa_pair("packed")
    params = split.init(jax.random.PRNGKey(0), x, mask, False)["params"]
    g = jnp.asarray(rng.normal(size=(B, T, d)).astype(np.float32))

    def run(mod):
        def f(p, xx):
            return (mod.apply({"params": p}, xx, mask, False) * g).sum()

        v = f(params, x)
        gp, gx = jax.grad(f, argnums=(0, 1))(params, x)
        return v, gp, gx

    v1, gp1, gx1 = run(split)
    v2, gp2, gx2 = run(packed)
    np.testing.assert_allclose(float(v2), float(v1), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(gx2), np.asarray(gx1), rtol=2e-4, atol=1e-5
    )
    for (k, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(gp1)[0],
        jax.tree_util.tree_flatten_with_path(gp2)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=1e-5,
            err_msg=str(k),
        )


def test_attn_packed_param_tree_identical():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 24, 384)).astype(np.float32))
    mask = jnp.ones((2, 24), bool)
    split, packed = _mhsa_pair("packed")
    p1 = split.init(jax.random.PRNGKey(3), x, mask, False)["params"]
    p2 = packed.init(jax.random.PRNGKey(3), x, mask, False)["params"]
    assert jax.tree_util.tree_structure(p1) == jax.tree_util.tree_structure(p2)


def test_split_fwd_bwd_plans_and_forced_folds(monkeypatch):
    """Round 5: forward and backward fold plans are independent (the
    forward's ~8-row live set admits larger Gb than the backward's ~14),
    and parity is invariant to the fold — including asymmetric forced
    combos like the campaign probe runs."""
    # Plan logic: at the headline-ish shape the forward folds at least as
    # much as the backward.
    fwd = pc._conv_plan(64, 240, 384, 2, bwd=False)
    bwd = pc._conv_plan(64, 240, 384, 2, bwd=True)
    assert fwd is not None and bwd is not None and fwd >= bwd
    # Headline-bucket plan pins (campaign C, runs/conv_gb_probe_r5.json):
    # the forward's Gb-independent intermediate charge admits the full
    # Gb=8 fold (silicon-proven); the backward stays at 1 under its
    # conservative ×Gb charge.
    assert fwd == 8 and bwd == 1
    # f32 doubles the block traffic: the forward plan must shrink.
    assert pc._conv_plan(64, 240, 384, 4, bwd=False) == 4
    # Env overrides route to the right side.
    monkeypatch.setenv("NEURALASR_CONV_GB_FWD", "4")
    monkeypatch.setenv("NEURALASR_CONV_GB_BWD", "2")
    assert pc._conv_plan(8, 48, 384, 4, bwd=False) == 4
    assert pc._conv_plan(8, 48, 384, 4, bwd=True) == 2

    # Parity under the asymmetric forced fold (interpret mode).
    x, _, mask = _inputs(B=8, T=40)
    xla, fused = _modules(jnp.float32)
    params = xla.init(jax.random.PRNGKey(5), x, mask, False)["params"]
    g = jnp.asarray(
        np.random.default_rng(6).normal(size=x.shape).astype(np.float32)
    )

    def grads(mod):
        def f(p, xx):
            out = mod.apply({"params": p}, xx, mask, False)
            return (out * g).sum()

        return jax.grad(f, argnums=(0, 1))(params, x)

    jax.clear_caches()  # Gb is read at trace time
    gp_want, gx_want = grads(xla)
    gp_got, gx_got = grads(fused)
    np.testing.assert_allclose(
        np.asarray(gx_got), np.asarray(gx_want), rtol=2e-4, atol=2e-4
    )
    for (k, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(gp_want)[0],
        jax.tree_util.tree_flatten_with_path(gp_got)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-4,
            err_msg=str(k),
        )
    monkeypatch.delenv("NEURALASR_CONV_GB_FWD")
    monkeypatch.delenv("NEURALASR_CONV_GB_BWD")
    jax.clear_caches()

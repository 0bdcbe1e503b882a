"""Pallas fused attention: forward/backward parity vs the jnp reference and
GSPMD partitioning (interpret mode on CPU; the same kernels compile on TPU).

Round 4: rope is fused in-kernel (applied to Q/K from [T, D] tables, with
the inverse rotation applied to dQ/dK in the backward) and the backward is
q-blocked with dK/dV accumulated across grid steps — both conventions are
pinned here against the jnp reference.
"""

import numpy as np

import jax
import jax.numpy as jnp

from neuralasr_tpu.ops.pallas_attention import (
    _attention_ref,
    _bwd_plan,
    apply_rope,
    flash_attention,
    flash_attention_rope,
    identity_tables,
    rope_tables,
)


def _inputs(B=4, T=48, H=4, D=32, dtype=np.float32, seed=0):
    rng = np.random.default_rng(seed)
    q, k, v, g = (
        jnp.asarray(rng.normal(size=(B, T, H, D)).astype(dtype))
        for _ in range(4)
    )
    lens = jnp.asarray(rng.integers(1, T + 1, size=(B,)), jnp.int32)
    return q, k, v, g, lens


def _ref(q, k, v, lens):
    cos, sin = identity_tables(q.shape[1], q.shape[3])
    return _attention_ref(q, k, v, lens, cos, sin)


def test_forward_matches_reference():
    q, k, v, _, lens = _inputs()
    out = flash_attention(q, k, v, lens)
    want = _ref(q, k, v, lens)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_forward_rope_matches_reference():
    """In-kernel rope (x @ R rotation-matmul formulation) must equal the
    XLA-side apply_rope (concat formulation) fed through the reference."""
    q, k, v, _, lens = _inputs(B=2, T=40, H=2, D=16)
    cos, sin = rope_tables(40, 16)
    out = flash_attention_rope(q, k, v, lens, cos, sin)
    want = _attention_ref(q, k, v, lens, cos, sin)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_backward_matches_reference_vjp():
    """The fused backward kernel must equal the reference VJP exactly —
    including padded-row conventions (len=1 rows, poisoned cotangents)."""
    q, k, v, g, _ = _inputs()
    lens = jnp.asarray([48, 13, 1, 30], jnp.int32)
    _, vjp_ref = jax.vjp(lambda a, b, c: _ref(a, b, c, lens), q, k, v)
    want = vjp_ref(g)
    _, vjp_p = jax.vjp(lambda a, b, c: flash_attention(a, b, c, lens), q, k, v)
    got = vjp_p(g)
    for name, a, b in zip(("dq", "dk", "dv"), got, want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5, err_msg=name
        )


def test_backward_rope_matches_reference_vjp():
    q, k, v, g, _ = _inputs(B=2, T=32, H=2, D=16, seed=3)
    lens = jnp.asarray([32, 11], jnp.int32)
    cos, sin = rope_tables(32, 16)
    _, vjp_ref = jax.vjp(
        lambda a, b, c: _attention_ref(a, b, c, lens, cos, sin), q, k, v
    )
    want = vjp_ref(g)
    _, vjp_p = jax.vjp(
        lambda a, b, c: flash_attention_rope(a, b, c, lens, cos, sin), q, k, v
    )
    got = vjp_p(g)
    for name, a, b in zip(("dq", "dk", "dv"), got, want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5, err_msg=name
        )


def test_backward_qblocked_accumulation():
    """Force multiple q blocks (T not a block multiple, so the time padding
    path runs too): dK/dV accumulated across grid steps must still match."""
    from neuralasr_tpu.ops import pallas_attention as pa

    q, k, v, g, _ = _inputs(B=2, T=72, H=2, D=16, seed=5)
    lens = jnp.asarray([61, 29], jnp.int32)
    cos, sin = rope_tables(72, 16)
    orig = pa._bwd_plan
    try:
        pa._bwd_plan = lambda BH, T, D, it: (2, 32)  # 72 -> 3 blocks + pad
        _, vjp_p = jax.vjp(
            lambda a, b, c: flash_attention_rope(a, b, c, lens, cos, sin),
            q, k, v,
        )
        got = vjp_p(g)
    finally:
        pa._bwd_plan = orig
    _, vjp_ref = jax.vjp(
        lambda a, b, c: _attention_ref(a, b, c, lens, cos, sin), q, k, v
    )
    want = vjp_ref(g)
    for name, a, b in zip(("dq", "dk", "dv"), got, want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5, err_msg=name
        )


def test_bwd_plan_fits_all_asr_lengths():
    """The q-blocked backward replaces round 3's T>~900 XLA-remat cliff:
    the plan must return a budget-fitting (G, bq) at every ASR-reachable
    T — charged at PADDED T via the kernel's own accounting helper
    (ADVICE r4: a plan checked at unpadded T could approve a kernel whose
    padded working set exceeds VMEM; non-multiple lengths like 261/950
    are the exposed cases)."""
    from neuralasr_tpu.ops import pallas_attention as pa

    # Attention runs post-subsample (T' <= ~768 for 30 s audio; 1920
    # covers no-subsample long-audio experiments).  261 and 950 sit just
    # past block boundaries, where padding doubles the naive estimate.
    for T in (240, 261, 480, 950, 960, 1920):
        plan = _bwd_plan(384, T, 64, 2)
        assert plan is not None, T
        G, bq = plan
        # Accounting must be padding-aware: charging T and charging the
        # explicit T_pad must agree (the helper pads internally)...
        T_pad = -(-T // bq) * bq
        assert pa._bwd_working_set(G, bq, T, 64, 2) == pa._bwd_working_set(
            G, bq, T_pad, 64, 2
        ), (T, G, bq)
        # ...and the padded working set must fit the budget.
        assert (
            pa._bwd_working_set(G, bq, T, 64, 2) <= pa._BWD_VMEM_BUDGET
        ), (T, G, bq)
    # The ADVICE r4 exposure case: BH=384, D=64, bf16, T=261.  Whatever
    # the plan picks, its PADDED set must fit (the old unpadded charge
    # approved (G=8, bq=256) at ~18.3 MB padded > 16 MB physical VMEM).
    G, bq = _bwd_plan(384, 261, 64, 2)
    assert pa._bwd_working_set(G, bq, 261, 64, 2) <= pa._BWD_VMEM_BUDGET
    # Long T trades G for block count but never falls off the kernel.
    G, bq = _bwd_plan(48, 1920, 64, 2)
    assert G * bq >= 256, (G, bq)
    # Past the budget the plan refuses — the reference-VJP fallback guard
    # (restored in round 4) takes over instead of an over-VMEM compile.
    assert _bwd_plan(384, 8192, 64, 4) is None


def test_bfloat16_grads_finite_and_close():
    q, k, v, g, lens = _inputs(dtype=np.float32)
    qb, kb, vb, gb = (x.astype(jnp.bfloat16) for x in (q, k, v, g))
    _, vjp = jax.vjp(lambda a, b, c: flash_attention(a, b, c, lens), qb, kb, vb)
    got = vjp(gb)
    _, vjp_ref = jax.vjp(lambda a, b, c: _ref(a, b, c, lens), q, k, v)
    want = vjp_ref(g)
    for a, b in zip(got, want):
        a = np.asarray(a, dtype=np.float32)
        assert np.isfinite(a).all()
        np.testing.assert_allclose(a, np.asarray(b), rtol=0.1, atol=0.15)


def test_mask_input_form():
    """[B, T] bool mask input is equivalent to lens input."""
    q, k, v, _, lens = _inputs(B=3, T=32)
    mask = jnp.arange(32)[None, :] < lens[:, None]
    np.testing.assert_allclose(
        np.asarray(flash_attention(q, k, v, mask)),
        np.asarray(flash_attention(q, k, v, lens)),
        rtol=1e-6,
    )


def test_apply_rope_matches_legacy_formulation():
    """Table-based rope == the round-3 in-place formulation."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 24, 3, 16)).astype(np.float32))
    cos, sin = rope_tables(24, 16)
    got = apply_rope(x, cos, sin)
    half = 8
    freqs = 10000.0 ** (-np.arange(0, half, dtype=np.float32) / half)
    ang = np.arange(24, dtype=np.float32)[:, None] * freqs[None, :]
    c = np.cos(ang)[None, :, None, :]
    s = np.sin(ang)[None, :, None, :]
    xn = np.asarray(x)
    x1, x2 = xn[..., :half], xn[..., half:]
    want = np.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


# Sharded fwd/bwd parity on an 8-device mesh lives in
# tests/distributed_checks.py (subprocess with fake devices).


def test_padded_query_rows_convention():
    """Rows past lens produce uniform attention into dV (matching the
    reference's where() semantics) — pin the convention explicitly."""
    q, k, v, g, _ = _inputs(B=1, T=8, H=1, D=4)
    lens = jnp.asarray([0], jnp.int32)
    out = flash_attention(q, k, v, lens)
    want = _ref(q, k, v, lens)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_backward_over_budget_reference_fallback():
    """When no (G, bq) fits the VMEM budget, the backward must route to
    the jnp reference VJP (the explicit guard restored in round 4) and
    still match the reference exactly."""
    from neuralasr_tpu.ops import pallas_attention as pa

    q, k, v, g, _ = _inputs(B=2, T=24, H=2, D=16, seed=9)
    lens = jnp.asarray([24, 10], jnp.int32)
    cos, sin = rope_tables(24, 16)
    orig = pa._BWD_VMEM_BUDGET
    try:
        pa._BWD_VMEM_BUDGET = 0  # nothing fits -> fallback
        assert pa._bwd_plan(4, 24, 16, 4) is None
        _, vjp = jax.vjp(
            lambda a, b, c: flash_attention_rope(a, b, c, lens, cos, sin),
            q, k, v,
        )
        got = vjp(g)
    finally:
        pa._BWD_VMEM_BUDGET = orig
    _, vjp_ref = jax.vjp(
        lambda a, b, c: _attention_ref(a, b, c, lens, cos, sin), q, k, v
    )
    want = vjp_ref(g)
    for name, a, b in zip(("dq", "dk", "dv"), got, want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5, err_msg=name
        )

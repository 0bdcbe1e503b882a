"""Pallas fused attention: forward/backward parity vs the jnp reference and
GSPMD partitioning (interpret mode on CPU; the same kernels compile on TPU).
"""

import numpy as np

import jax
import jax.numpy as jnp

from neuralasr_tpu.ops.pallas_attention import (
    _attention_ref,
    _bwd_fits_vmem,
    flash_attention,
)


def _inputs(B=4, T=48, H=4, D=32, dtype=np.float32, seed=0):
    rng = np.random.default_rng(seed)
    q, k, v, g = (
        jnp.asarray(rng.normal(size=(B, T, H, D)).astype(dtype))
        for _ in range(4)
    )
    lens = jnp.asarray(rng.integers(1, T + 1, size=(B,)), jnp.int32)
    return q, k, v, g, lens


def test_forward_matches_reference():
    q, k, v, _, lens = _inputs()
    out = flash_attention(q, k, v, lens)
    want = _attention_ref(q, k, v, lens)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_backward_matches_reference_vjp():
    """The fused backward kernel must equal the reference VJP exactly —
    including padded-row conventions (len=1 rows, poisoned cotangents)."""
    q, k, v, g, _ = _inputs()
    lens = jnp.asarray([48, 13, 1, 30], jnp.int32)
    _, vjp_ref = jax.vjp(lambda a, b, c: _attention_ref(a, b, c, lens), q, k, v)
    want = vjp_ref(g)
    _, vjp_p = jax.vjp(lambda a, b, c: flash_attention(a, b, c, lens), q, k, v)
    got = vjp_p(g)
    for name, a, b in zip(("dq", "dk", "dv"), got, want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5, err_msg=name
        )


def test_backward_vmem_fallback_path():
    """Shapes past the VMEM budget take the jnp-remat fallback; gradients
    must agree with the reference either way."""
    assert _bwd_fits_vmem(768, 64)
    assert not _bwd_fits_vmem(4096, 64)
    # Force tiny budget semantics by checking the fallback directly.
    q, k, v, g, lens = _inputs(B=2, T=16, H=2, D=8)
    from neuralasr_tpu.ops import pallas_attention as pa

    orig = pa._BWD_VMEM_BUDGET
    try:
        pa._BWD_VMEM_BUDGET = 0  # everything falls back
        _, vjp = jax.vjp(
            lambda a, b, c: flash_attention(a, b, c, lens), q, k, v
        )
        got = vjp(g)
    finally:
        pa._BWD_VMEM_BUDGET = orig
    _, vjp_ref = jax.vjp(
        lambda a, b, c: _attention_ref(a, b, c, lens), q, k, v
    )
    want = vjp_ref(g)
    for a, b in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )


def test_bfloat16_grads_finite_and_close():
    q, k, v, g, lens = _inputs(dtype=np.float32)
    qb, kb, vb, gb = (x.astype(jnp.bfloat16) for x in (q, k, v, g))
    _, vjp = jax.vjp(lambda a, b, c: flash_attention(a, b, c, lens), qb, kb, vb)
    got = vjp(gb)
    _, vjp_ref = jax.vjp(
        lambda a, b, c: _attention_ref(a, b, c, lens), q, k, v
    )
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


# Sharded fwd/bwd parity on an 8-device mesh lives in
# tests/distributed_checks.py (subprocess with fake devices).


def test_padded_query_rows_convention():
    """Rows past lens produce uniform attention into dV (matching the
    reference's where() semantics) — pin the convention explicitly."""
    q, k, v, g, _ = _inputs(B=1, T=8, H=1, D=4)
    lens = jnp.asarray([0], jnp.int32)
    out = flash_attention(q, k, v, lens)
    want = _attention_ref(q, k, v, lens)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(want), rtol=1e-5, atol=1e-5
    )

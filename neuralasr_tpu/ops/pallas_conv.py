"""Fused Conformer conv-module Pallas kernel (BASELINE.json configs[4]:
"Pallas fused attention + conv module" — the conv half; VERDICT r4 item 2).

The XLA path (models/conformer.py ConvModule) runs the chain
LN -> pw_in -> GLU -> mask -> depthwise-conv(K) -> LN -> swish -> pw_out as
eight separate fusions: the [T, 2d] GLU intermediate, the conv input/output
and both LayerNorm stats round-trip HBM between the two matmuls, and the r4
trace charges the module 5.6 ms/step of pw+dw time at ~44 % flops-util —
far from its ~2.5 ms matmul floor.  Here the whole chain runs in one grid
program per batch-row group: every intermediate lives in VMEM, the
depthwise conv is K sublane-shifted multiply-accumulates over the
VMEM-resident tile (the framed-frontend pattern — ops/pallas_frontend.py
proved shifted sublane slices compile), and the backward recomputes the
chain flash-style and accumulates all weight gradients in f32 directly in
constant-index-map output blocks across the sequential grid (the Pallas TPU
reduction idiom; grids execute in order).

Alignment notes (Mosaic lane rules, learned rounds 3-4): the GLU split and
the [da, dbg] cotangent concat touch the lane dim only at d = 384 = 3x128
offsets; the depthwise conv shifts the SUBLANE dim only.  No sub-128 lane
slicing anywhere.

Off-TPU the kernels run in interpret mode; shapes whose working set
exceeds the VMEM budget fall back to the jnp reference (_conv_ref), which
is also the parity oracle in tests/test_pallas_conv.py.
"""

from __future__ import annotations

import functools

import jax

from . import runtime
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_LN_EPS = 1e-6  # flax nn.LayerNorm default


# ---------------- jnp reference (parity oracle + fallback) ----------------


def _conv_ref(x, lens, g1, b1, win, bin_, wdw, bdw, g2, b2, wout, bout):
    """Mirror of the XLA ConvModule math: x [B,T,d] in the compute dtype,
    params in their storage dtype (cast like flax Dense/Conv do)."""
    cd = x.dtype
    B, T, d = x.shape

    def ln(v, g, b):
        vf = v.astype(jnp.float32)
        mu = jnp.mean(vf, axis=-1, keepdims=True)
        var = jnp.maximum(
            jnp.mean(vf * vf, axis=-1, keepdims=True) - mu * mu, 0.0
        )
        xhat = (vf - mu) * jax.lax.rsqrt(var + _LN_EPS)
        return (xhat * g.astype(jnp.float32) + b.astype(jnp.float32)).astype(
            cd
        )

    h = ln(x, g1, b1)
    h = h @ win.astype(cd) + bin_.astype(cd)
    a, gate = h[..., :d], h[..., d:]
    h = a * jax.nn.sigmoid(gate)
    mask = (jnp.arange(T)[None, :] < lens[:, None]).astype(cd)
    h = h * mask[:, :, None]
    h = jax.lax.conv_general_dilated(
        h,
        wdw.reshape(wdw.shape[0], 1, d).astype(cd),
        window_strides=(1,),
        padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=d,
    ) + bdw.astype(cd)
    h = ln(h, g2, b2)
    h = h * jax.nn.sigmoid(h)
    return h @ wout.astype(cd) + bout.astype(cd)


# ---------------- kernel helpers ----------------


def _ln_fwd(xf, g, b):
    """f32 LN with flax's fast-variance stats; returns (y_f32, xhat, rinv)."""
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0)
    rinv = jax.lax.rsqrt(var + _LN_EPS)
    xhat = (xf - mu) * rinv
    return xhat * g + b, xhat, rinv


def _ln_bwd(dy, xhat, rinv, g):
    """dx for y = xhat*g + b (dy, xhat f32; returns f32 dx)."""
    dxh = dy * g
    m1 = jnp.mean(dxh, axis=-1, keepdims=True)
    m2 = jnp.mean(dxh * xhat, axis=-1, keepdims=True)
    return rinv * (dxh - m1 - xhat * m2)


def _mm(a, b, cd, contract=((1,), (0,))):
    """MXU matmul in the compute dtype with f32 accumulation."""
    return jax.lax.dot_general(
        a.astype(cd), b.astype(cd),
        dimension_numbers=(contract, ((), ())),
        preferred_element_type=jnp.float32,
    )


def _dw_pad(h, P):
    z = jnp.zeros((P, h.shape[1]), h.dtype)
    return jnp.concatenate([z, h, z], axis=0)  # sublane concat only


# ---------------- forward kernel ----------------


def _fwd_kernel(len_ref, x_ref, g1_ref, b1_ref, win_ref, bin_ref, wdw_ref,
                bdw_ref, g2_ref, b2_ref, wout_ref, bout_ref, y_ref,
                *, Gb: int, K: int):
    T, d = x_ref.shape[1], x_ref.shape[2]
    cd = x_ref.dtype
    P = (K - 1) // 2
    g1 = g1_ref[0].astype(jnp.float32)
    b1 = b1_ref[0].astype(jnp.float32)
    g2 = g2_ref[0].astype(jnp.float32)
    b2 = b2_ref[0].astype(jnp.float32)
    for g in range(Gb):
        n = len_ref[pl.program_id(0) * Gb + g]
        xf = x_ref[g].astype(jnp.float32)  # [T, d]
        h0, _, _ = _ln_fwd(xf, g1, b1)
        h1 = _mm(h0.astype(cd), win_ref[...], cd) + bin_ref[0].astype(
            jnp.float32
        )  # [T, 2d] f32
        a, gate = h1[:, :d], h1[:, d:]  # lane split at d (128-aligned)
        h2 = a * jax.nn.sigmoid(gate)
        ridx = jax.lax.broadcasted_iota(jnp.int32, (T, d), 0)
        h2 = jnp.where(ridx < n, h2, 0.0)
        hp = _dw_pad(h2, P)  # [T+K-1, d]
        acc = jnp.zeros((T, d), jnp.float32)
        for j in range(K):
            acc += hp[j : j + T, :] * wdw_ref[j].astype(jnp.float32)
        h4 = acc + bdw_ref[0].astype(jnp.float32)
        h5, _, _ = _ln_fwd(h4, g2, b2)
        h6 = h5 * jax.nn.sigmoid(h5)
        y = _mm(h6.astype(cd), wout_ref[...], cd) + bout_ref[0].astype(
            jnp.float32
        )
        y_ref[g] = y.astype(y_ref.dtype)


# ---------------- backward kernel ----------------


def _bwd_kernel(len_ref, x_ref, dy_ref, g1_ref, b1_ref, win_ref, bin_ref,
                wdw_ref, bdw_ref, g2_ref, b2_ref, wout_ref, bout_ref,
                dx_ref, dg1_ref, db1_ref, dwin_ref, dbin_ref, dwdw_ref,
                dbdw_ref, dg2_ref, db2_ref, dwout_ref, dbout_ref,
                *, Gb: int, K: int):
    T, d = x_ref.shape[1], x_ref.shape[2]
    cd = x_ref.dtype
    P = (K - 1) // 2

    @pl.when(pl.program_id(0) == 0)
    def _():
        for r in (dg1_ref, db1_ref, dwin_ref, dbin_ref, dwdw_ref, dbdw_ref,
                  dg2_ref, db2_ref, dwout_ref, dbout_ref):
            r[...] = jnp.zeros(r.shape, r.dtype)

    g1 = g1_ref[0].astype(jnp.float32)
    b1 = b1_ref[0].astype(jnp.float32)
    g2 = g2_ref[0].astype(jnp.float32)
    b2 = b2_ref[0].astype(jnp.float32)
    for g in range(Gb):
        n = len_ref[pl.program_id(0) * Gb + g]
        xf = x_ref[g].astype(jnp.float32)
        # ---- recompute the forward chain (flash-style) ----
        h0, xhat1, rinv1 = _ln_fwd(xf, g1, b1)
        h1 = _mm(h0.astype(cd), win_ref[...], cd) + bin_ref[0].astype(
            jnp.float32
        )
        a, gate = h1[:, :d], h1[:, d:]
        sa = jax.nn.sigmoid(gate)
        h2 = a * sa
        ridx = jax.lax.broadcasted_iota(jnp.int32, (T, d), 0)
        rmask = (ridx < n).astype(jnp.float32)
        h2m = h2 * rmask
        hp = _dw_pad(h2m, P)
        acc = jnp.zeros((T, d), jnp.float32)
        for j in range(K):
            acc += hp[j : j + T, :] * wdw_ref[j].astype(jnp.float32)
        h4 = acc + bdw_ref[0].astype(jnp.float32)
        h5, xhat2, rinv2 = _ln_fwd(h4, g2, b2)
        ssw = jax.nn.sigmoid(h5)
        h6 = h5 * ssw
        # ---- backward ----
        dy = dy_ref[g].astype(jnp.float32)
        dwout_ref[...] += _mm(h6.astype(cd), dy.astype(cd), cd,
                              contract=((0,), (0,)))
        dbout_ref[...] += jnp.sum(dy, axis=0, keepdims=True)
        dh6 = _mm(dy.astype(cd), wout_ref[...], cd, contract=((1,), (1,)))
        dh5 = dh6 * (ssw * (1.0 + h5 * (1.0 - ssw)))  # swish'
        dg2_ref[...] += jnp.sum(dh5 * xhat2, axis=0, keepdims=True)
        db2_ref[...] += jnp.sum(dh5, axis=0, keepdims=True)
        dh4 = _ln_bwd(dh5, xhat2, rinv2, g2)
        dbdw_ref[...] += jnp.sum(dh4, axis=0, keepdims=True)
        # depthwise-conv VJP: dwdw[j] = sum_t hp[t+j] * dh4[t];
        # dh2m = sum_j wdw[K-1-j] * dhp[j:j+T] (transposed correlation).
        dhp = _dw_pad(dh4, P)
        dh2m = jnp.zeros((T, d), jnp.float32)
        for j in range(K):
            dwdw_ref[j] += jnp.sum(hp[j : j + T, :] * dh4, axis=0)
            dh2m += dhp[j : j + T, :] * wdw_ref[K - 1 - j].astype(jnp.float32)
        dh2 = dh2m * rmask
        da = dh2 * sa
        dgate = dh2 * a * sa * (1.0 - sa)
        dh1 = jnp.concatenate([da, dgate], axis=1)  # lane concat at d
        dwin_ref[...] += _mm(h0.astype(cd), dh1.astype(cd), cd,
                             contract=((0,), (0,)))
        dbin_ref[...] += jnp.sum(dh1, axis=0, keepdims=True)
        dh0 = _mm(dh1.astype(cd), win_ref[...], cd, contract=((1,), (1,)))
        dg1_ref[...] += jnp.sum(dh0 * xhat1, axis=0, keepdims=True)
        db1_ref[...] += jnp.sum(dh0, axis=0, keepdims=True)
        dx = _ln_bwd(dh0, xhat1, rinv1, g1)
        dx_ref[g] = dx.astype(dx_ref.dtype)


# ---------------- plans ----------------

_VMEM_BUDGET = 12 * 1024 * 1024


def _working_set(Gb: int, T: int, d: int, itemsize: int, bwd: bool) -> int:
    """Per-program VMEM charge.  The f32 [T, d] intermediates are charged
    at the PEAK LIVE set (~8 rows fwd / ~14 rows bwd counting the 2d-wide
    GLU input as two rows), not one slot per SSA value — the chain is
    strictly sequential, so Mosaic reuses dead buffers (the r4 attention
    kernels validated the same style of accounting on silicon; charging
    every value would push even Gb=1 bf16 headline shapes past any
    budget and silently route everything to the fallback).

    FORWARD intermediates are additionally charged Gb-INDEPENDENTLY
    (round-5 campaign C): the unrolled per-row chains are themselves
    sequential — row g+1's intermediates allocate only after row g's are
    dead — and silicon proves the reuse: the Gb=8 forward at the headline
    shape (which the ×Gb model charges at ~31 MB, double physical VMEM)
    compiles and passes parity (runs/conv_gb_probe_r5.json).  The
    BACKWARD keeps the conservative ×Gb charge as a deliberate choice:
    its live set interleaves with the dweight accumulators, and the
    measured bwd=2 step rows showed no win over bwd=1 (same probe), so
    there is nothing to buy by loosening it.  Weights are charged at f32
    (param storage dtype) with constant index maps (single-buffered);
    x/dy/dx blocks double-buffered."""
    row_f32 = T * d * 4
    inter = 14 * row_f32 * Gb if bwd else 8 * row_f32
    weights = (d * 2 * d + d * d + (16 + 8) * d) * 4
    dweights = (d * 2 * d + d * d + (16 + 8) * d) * 4 if bwd else 0
    blocks = Gb * T * d * itemsize * 2 * (3 if bwd else 2)  # x, dy, dx/y
    return inter + weights + dweights + blocks


def _conv_plan(B: int, T: int, d: int, itemsize: int, bwd: bool = True):
    """Largest Gb dividing B whose working set fits; None when nothing
    fits (caller falls back to the jnp reference).  Forward and backward
    plan INDEPENDENTLY (round 5): the forward's peak live set is ~8 f32
    rows per batch row vs the backward's ~14, so the forward can fold
    more rows per grid program — and the r5a trace showed the Gb=1 kernel
    is dispatch-bound (~1500 grid programs/step across the 24 per-layer
    calls, the same disease as r3's G=1 attention).  Parity is invariant
    to Gb (tests/test_pallas_conv.py), so the split is purely a
    dispatch-economics choice.

    NEURALASR_CONV_GB / NEURALASR_CONV_GB_FWD / NEURALASR_CONV_GB_BWD
    override (measurement campaigns probe folds beyond the conservative
    VMEM charge; preflight catches any over-VMEM Mosaic failure on
    silicon before a bench row rides the setting)."""
    import os

    force = os.environ.get(
        "NEURALASR_CONV_GB_BWD" if bwd else "NEURALASR_CONV_GB_FWD"
    ) or os.environ.get("NEURALASR_CONV_GB")
    if force:
        gb = int(force)
        return gb if gb > 0 and B % gb == 0 else None
    for Gb in (8, 4, 2, 1):
        if B % Gb:
            continue
        if _working_set(Gb, T, d, itemsize, bwd=bwd) <= _VMEM_BUDGET:
            return Gb
    return None


# ---------------- pallas_call wrappers ----------------


def _vec2(p):
    return p.reshape(1, -1)


def _param_specs(d: int, K: int):
    full = lambda shape: pl.BlockSpec(
        shape, lambda i, lens: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    return [
        full((1, d)), full((1, d)),        # g1, b1
        full((d, 2 * d)), full((1, 2 * d)),  # win, bin
        full((K, d)), full((1, d)),        # wdw, bdw
        full((1, d)), full((1, d)),        # g2, b2
        full((d, d)), full((1, d)),        # wout, bout
    ]


def _forward_pallas(x, lens, params, Gb, interpret):
    B, T, d = x.shape
    K = params[4].shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // Gb,),
        in_specs=[
            pl.BlockSpec((Gb, T, d), lambda i, lens: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            *_param_specs(d, K),
        ],
        out_specs=pl.BlockSpec((Gb, T, d), lambda i, lens: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, Gb=Gb, K=K),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, T, d), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * d * (2 * d + d + K),
            bytes_accessed=2 * B * T * d * x.dtype.itemsize,
            transcendentals=3 * B * T * d,
        ),
    )(lens, x, *params)


def _backward_pallas(x, lens, params, dy, Gb, interpret):
    B, T, d = x.shape
    K = params[4].shape[0]
    blk = pl.BlockSpec((Gb, T, d), lambda i, lens: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // Gb,),
        in_specs=[blk, blk, *_param_specs(d, K)],
        out_specs=[blk, *_param_specs(d, K)],
    )
    shapes = [
        jax.ShapeDtypeStruct((B, T, d), x.dtype),  # dx
        jax.ShapeDtypeStruct((1, d), jnp.float32),
        jax.ShapeDtypeStruct((1, d), jnp.float32),
        jax.ShapeDtypeStruct((d, 2 * d), jnp.float32),
        jax.ShapeDtypeStruct((1, 2 * d), jnp.float32),
        jax.ShapeDtypeStruct((K, d), jnp.float32),
        jax.ShapeDtypeStruct((1, d), jnp.float32),
        jax.ShapeDtypeStruct((1, d), jnp.float32),
        jax.ShapeDtypeStruct((1, d), jnp.float32),
        jax.ShapeDtypeStruct((d, d), jnp.float32),
        jax.ShapeDtypeStruct((1, d), jnp.float32),
    ]
    return pl.pallas_call(
        functools.partial(_bwd_kernel, Gb=Gb, K=K),
        grid_spec=grid_spec,
        out_shape=shapes,
        interpret=interpret,
        # flops = 2x forward, matching XLA's backward-counting convention
        # so step-level mfu stays comparable across conv_impl (the
        # recompute inside the kernel is real work but XLA would not
        # count it either under remat).
        cost_estimate=pl.CostEstimate(
            flops=4 * B * T * d * (2 * d + d + K),
            bytes_accessed=4 * B * T * d * x.dtype.itemsize,
            transcendentals=6 * B * T * d,
        ),
    )(lens, x, dy, *params)


# ---------------- GSPMD partitioning (batch axis) ----------------
#
# A bare pallas_call is opaque to GSPMD, so the fwd/bwd calls are wrapped
# in batch-axis custom_partitioning (the round-4 streaming-CTC pattern,
# ops/pallas_ctc.py): every batch row is independent through the whole
# chain (LN/matmuls mix only the feature dim, the depthwise conv only the
# time dim), so each shard runs the kernel on its local rows; the
# backward's weight gradients are per-shard partial sums, psum'd over the
# batch axis inside the partitioned lowering.  Non-batch dims (t/d/e/k/f)
# are declared replication-required.


def _fwd_impl(x, lens, *params):
    Gb = _conv_plan(
        x.shape[0], x.shape[1], x.shape[2], x.dtype.itemsize, bwd=False
    )
    if Gb is None:  # forced/odd local batch: jnp reference, same math
        return _conv_ref(x, lens, *params)
    interpret = not runtime.on_tpu()
    return _forward_pallas(x, lens, params, Gb, interpret)


def _bwd_impl(x, lens, dy, *params):
    Gb = _conv_plan(x.shape[0], x.shape[1], x.shape[2], x.dtype.itemsize)
    if Gb is None:
        _, vjp = jax.vjp(lambda xx, *pp: _conv_ref(xx, lens, *pp), x, *params)
        dx, *dps = vjp(dy.astype(x.dtype))
        return (dx, *[g.astype(jnp.float32) for g in dps])
    interpret = not runtime.on_tpu()
    return tuple(
        _backward_pallas(x, lens, params, dy.astype(x.dtype), Gb, interpret)
    )


from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P


def _batch_axis(arg_shapes):
    spec = arg_shapes[0].sharding.spec  # x [B, T, d]
    return spec[0] if len(spec) else None


_CONV_FACTORS = "u d, u d, d e, u e, k d, u d, u d, u d, d f, u f"


def _fwd_partition(mesh, arg_shapes, result_shape):
    b = _batch_axis(arg_shapes)
    xs = NamedSharding(mesh, P(b, None, None))
    ls = NamedSharding(mesh, P(b))
    rep = NamedSharding(mesh, P(None, None))

    def lower_fn(x, lens, *params):
        return _fwd_impl(x, lens, *params)

    return mesh, lower_fn, xs, (xs, ls) + (rep,) * 10


@custom_partitioning
def _conv_fwd_p(x, lens, g1, b1, win, bin_, wdw, bdw, g2, b2, wout, bout):
    return _fwd_impl(x, lens, g1, b1, win, bin_, wdw, bdw, g2, b2, wout,
                     bout)


_conv_fwd_p.def_partition(
    partition=_fwd_partition,
    infer_sharding_from_operands=lambda mesh, arg_shapes, result_shape: (
        NamedSharding(mesh, P(_batch_axis(arg_shapes), None, None))
    ),
    # need_replication order = first-appearance order in the rule string
    # (Shardy requires sorted special-factor indices).
    sharding_rule=f"b t d, b, {_CONV_FACTORS} -> b t f",
    need_replication_factors=("t", "d", "u", "e", "k", "f"),
)


def _bwd_partition(mesh, arg_shapes, result_shape):
    b = _batch_axis(arg_shapes)
    xs = NamedSharding(mesh, P(b, None, None))
    ls = NamedSharding(mesh, P(b))
    rep = NamedSharding(mesh, P(None, None))

    def lower_fn(x, lens, dy, *params):
        outs = _bwd_impl(x, lens, dy, *params)
        if b is not None:  # weight grads: sum the per-shard partials
            outs = (outs[0],) + tuple(
                jax.lax.psum(o, b) for o in outs[1:]
            )
        return outs

    return mesh, lower_fn, (xs,) + (rep,) * 10, (xs, ls, xs) + (rep,) * 10


@custom_partitioning
def _conv_bwd_p(x, lens, dy, g1, b1, win, bin_, wdw, bdw, g2, b2, wout,
                bout):
    return _bwd_impl(x, lens, dy, g1, b1, win, bin_, wdw, bdw, g2, b2,
                     wout, bout)


_conv_bwd_p.def_partition(
    partition=_bwd_partition,
    infer_sharding_from_operands=lambda mesh, arg_shapes, result_shape: (
        lambda b: tuple(
            [NamedSharding(mesh, P(b, None, None))]
            + [NamedSharding(mesh, P(None, None))] * 10
        )
    )(_batch_axis(arg_shapes)),
    sharding_rule=(
        f"b t d, b, b t f, {_CONV_FACTORS} -> b t d, {_CONV_FACTORS}"
    ),
    need_replication_factors=("t", "d", "f", "u", "e", "k"),
)


# ---------------- public surface ----------------


def _as_lens(mask_or_lens):
    if mask_or_lens.ndim == 2:
        return mask_or_lens.astype(jnp.int32).sum(axis=1)
    return mask_or_lens.astype(jnp.int32)


@jax.custom_vjp
def _fused(x, lens, g1, b1, win, bin_, wdw, bdw, g2, b2, wout, bout):
    params = (_vec2(g1), _vec2(b1), win, _vec2(bin_), wdw, _vec2(bdw),
              _vec2(g2), _vec2(b2), wout, _vec2(bout))
    return _conv_fwd_p(x, lens, *params)


def _fused_fwd(x, lens, g1, b1, win, bin_, wdw, bdw, g2, b2, wout, bout):
    out = _fused(x, lens, g1, b1, win, bin_, wdw, bdw, g2, b2, wout, bout)
    return out, (x, lens, g1, b1, win, bin_, wdw, bdw, g2, b2, wout, bout)


def _fused_bwd(res, dy):
    x, lens, g1, b1, win, bin_, wdw, bdw, g2, b2, wout, bout = res
    params = (_vec2(g1), _vec2(b1), win, _vec2(bin_), wdw, _vec2(bdw),
              _vec2(g2), _vec2(b2), wout, _vec2(bout))
    outs = _conv_bwd_p(x, lens, dy.astype(x.dtype), *params)
    (dx, dg1, db1, dwin, dbin, dwdw, dbdw, dg2, db2, dwout, dbout) = outs
    cast = lambda t, p: t.reshape(p.shape).astype(p.dtype)
    return (dx, None, cast(dg1, g1), cast(db1, b1), cast(dwin, win),
            cast(dbin, bin_), cast(dwdw, wdw), cast(dbdw, bdw),
            cast(dg2, g2), cast(db2, b2), cast(dwout, wout),
            cast(dbout, bout))


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_conv_module(x, mask_or_lens, g1, b1, win, bin_, wdw, bdw, g2, b2,
                      wout, bout):
    """Fused Conformer conv module: x [B,T,d] (compute dtype) -> [B,T,d].
    wdw is [K, d] (the flax [K,1,d] depthwise kernel squeezed).  Falls back
    to the jnp reference when the working set exceeds the VMEM budget.
    Mesh-safe: fwd and bwd are batch-axis custom_partitioned (each shard
    runs the kernel on its local rows; weight grads psum'd over the batch
    axis — tests/distributed_checks.py::check_conv_pallas_under_mesh).
    Weights themselves are replicated by the partition spec; under a
    'model'-sharded mesh GSPMD inserts the gather, so the XLA path remains
    the better choice when the ENCODER WEIGHTS are what's sharded."""
    lens = _as_lens(mask_or_lens)
    B, T, d = x.shape
    if (
        _conv_plan(B, T, d, x.dtype.itemsize, bwd=False) is None
        or _conv_plan(B, T, d, x.dtype.itemsize, bwd=True) is None
    ):
        return _conv_ref(x, lens, g1, b1, win, bin_, wdw, bdw, g2, b2,
                         wout, bout)
    return _fused(x, lens, g1, b1, win, bin_, wdw, bdw, g2, b2, wout, bout)

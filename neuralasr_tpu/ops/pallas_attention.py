"""Fused self-attention Pallas kernel for ASR-length sequences.

Design (see /opt/skills/guides/pallas_guide.md): grid over
(batch, heads, query-blocks); each program holds its full K/V stripe in VMEM
(ASR T <= ~3k frames after 4x subsampling, so K/V stripes are <1 MB — no
streaming needed), computes S = QK^T on the MXU, masks padded keys from the
per-row length, softmaxes in VMEM, and hits the MXU again for PV.  This is
the "Pallas attention blockwise over time within one chip" of SURVEY.md §6.

Backward: a fused Pallas kernel (one program per (batch, head)) that
recomputes S in VMEM and emits dQ/dK/dV in a single pass — no O(T^2)
residuals ever reach HBM, unlike round 1's XLA rematerialization which
materialized the full attention matrix in the backward (VERDICT.md round-1
weak #8).  ASR sequences after 4x subsampling are short enough (T <= ~1k)
that the whole T x T scratch fits VMEM; longer inputs fall back to the jnp
reference VJP (the guard is explicit, not a silent cliff).

Off-TPU the kernels run in interpret mode, keeping tests CPU-runnable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _attention_ref(q, k, v, lens):
    """jnp reference: q,k,v [B,T,H,D], lens [B] -> [B,T,H,D]."""
    B, T, H, D = q.shape
    scale = 1.0 / (D**0.5)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    mask = jnp.arange(T)[None, :] < lens[:, None]  # [B, T]
    logits = jnp.where(mask[:, None, None, :], logits, NEG_INF)
    attn = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", attn, v)


def _kernel(len_ref, q_ref, k_ref, v_ref, o_ref, *, block_q: int, T: int,
            G: int):
    # len_ref: scalar-prefetch [B*H] in SMEM; q_ref [G, BQ, D];
    # k_ref/v_ref [G, T, D].  (Heads are folded into the grid's batch dim so
    # the trailing block dims are (time, head_dim) — the TPU-tileable
    # layout; per-row lengths ride in as prefetched scalars.)
    #
    # G batch-head rows per program (statically unrolled): each grid-program
    # dispatch costs ~12 us on v5e, so the G=1 grid of B*H*ceil(T/BQ)
    # programs was dispatch-overhead-bound at ASR shapes — 768 programs
    # ~ 9 ms at (B=64, H=6, T=240), ~7x the kernel's compute
    # (BASELINE.md r3 "attention dispatch policy").  Folding G rows cuts
    # dispatches G-fold; the per-row matmuls are unchanged.
    D = q_ref.shape[-1]
    scale = 1.0 / (D**0.5)
    for g in range(G):
        q = q_ref[g]
        k = k_ref[g]
        v = v_ref[g]
        s = jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [BQ, T]
        n = len_ref[pl.program_id(0) * G + g]
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype),
            v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) / denom
        o_ref[g] = o.astype(o_ref.dtype)


# Keep a program's blocks (double-buffered q/o and k/v stripes) comfortably
# inside the ~16 MB/core VMEM next to the [BQ, T] f32 score scratch.
_FWD_VMEM_BUDGET = 10 * 1024 * 1024


def _fold_rows(BH: int, T: int, bq: int, D: int, itemsize: int) -> int:
    """Largest G <= 8 dividing B*H whose blocks fit the VMEM budget."""
    for G in (8, 6, 4, 3, 2):
        if BH % G:
            continue
        blocks = (2 * bq * D + 2 * T * D) * G * itemsize * 2  # double-buffer
        if blocks + bq * T * 4 <= _FWD_VMEM_BUDGET:
            return G
    return 1


def _forward(q, k, v, lens, block_q: int = 128, interpret: bool | None = None):
    B, T, H, D = q.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bq = min(block_q, T)
    # Fold heads into the grid's batch dim: [B,T,H,D] -> [B*H,T,D] so every
    # block's trailing dims are (time, head_dim) — TPU tiling wants the last
    # two dims (divisible by 8, 128) or equal to the array dims.
    qf = q.transpose(0, 2, 1, 3).reshape(B * H, T, D)
    kf = k.transpose(0, 2, 1, 3).reshape(B * H, T, D)
    vf = v.transpose(0, 2, 1, 3).reshape(B * H, T, D)
    lens_bh = jnp.repeat(lens.astype(jnp.int32), H)  # [B*H] scalar-prefetch
    G = _fold_rows(B * H, T, bq, D, q.dtype.itemsize)
    grid = (B * H // G, pl.cdiv(T, bq))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (G, bq, D), lambda bh, qi, lens: (bh, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (G, T, D), lambda bh, qi, lens: (bh, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (G, T, D), lambda bh, qi, lens: (bh, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (G, bq, D), lambda bh, qi, lens: (bh, qi, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    of = pl.pallas_call(
        functools.partial(_kernel, block_q=bq, T=T, G=G),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * H, T, D), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * T * T * D,
            bytes_accessed=4 * (3 * B * T * H * D + B * T * H * D),
            transcendentals=B * H * T * T,
        ),
    )(lens_bh, qf, kf, vf)
    return of.reshape(B, H, T, D).transpose(0, 2, 1, 3)


# ---------------- GSPMD partitioning ----------------
#
# A bare pallas_call is opaque to the partitioner: under a sharded mesh
# GSPMD would all-gather its inputs onto every device (or refuse to
# partition), which is why round 1's multi-chip dryrun had to swap the
# kernel out for XLA attention (VERDICT.md round-1 item 2).
# custom_partitioning declares the kernel's parallelism to the compiler:
# batch and head axes are embarrassingly parallel (each (b, h) pair's
# attention is independent), while time and head_dim must stay whole on
# each shard (the kernel holds the full K/V stripe in VMEM and masks keys
# from per-row lengths).  The partitioner then runs the kernel per-shard
# on ('data' x 'model')-sharded activations with zero collectives.

from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P


def _attn_specs(mesh, arg_shapes):
    """Per-shard shardings: keep whatever b/h axes the partitioner
    suggested for q, force t/d replicated, and tie lens to q's batch."""
    spec = arg_shapes[0].sharding.spec
    b = spec[0] if len(spec) > 0 else None
    h = spec[2] if len(spec) > 2 else None
    qkv = NamedSharding(mesh, P(b, None, h, None))
    lens = NamedSharding(mesh, P(b))
    return qkv, lens


def _infer_sharding(mesh, arg_shapes, result_shape):
    return _attn_specs(mesh, arg_shapes)[0]


def _partition(mesh, arg_shapes, result_shape):
    qkv, lens = _attn_specs(mesh, arg_shapes)

    def lower_fn(q, k, v, l):
        return _forward(q, k, v, l)

    return mesh, lower_fn, qkv, (qkv, qkv, qkv, lens)


@custom_partitioning
def _forward_partitioned(q, k, v, lens):
    return _forward(q, k, v, lens)


_forward_partitioned.def_partition(
    partition=_partition,
    infer_sharding_from_operands=_infer_sharding,  # GSPMD path
    # Shardy path (the jax 0.9 default partitioner): einsum-style rule —
    # b and h shard freely; t and d must be replicated per shard.
    sharding_rule="b t h d, b t h d, b t h d, b -> b t h d",
    need_replication_factors=("t", "d"),
)


@jax.custom_vjp
def flash_attention(q, k, v, mask_or_lens):
    """q,k,v [B,T,H,D]; mask_or_lens: either lens [B] int or mask [B,T] bool.

    GSPMD-partitionable: safe under any ('data','model') sharding.
    """
    lens = _as_lens(mask_or_lens)
    return _forward_partitioned(q, k, v, lens)


@jax.custom_vjp
def flash_attention_local(q, k, v, mask_or_lens):
    """Single-device variant: the bare Pallas call without the
    custom_partitioning custom-call boundary (an opaque boundary can block
    XLA fusion around the kernel on one chip, where partitioning buys
    nothing).  Numerically identical to flash_attention; NOT safe under a
    sharded mesh.
    """
    lens = _as_lens(mask_or_lens)
    return _forward(q, k, v, lens)


def _as_lens(mask_or_lens):
    if mask_or_lens.ndim == 2:  # [B, T] bool mask -> lengths (contiguous)
        return mask_or_lens.astype(jnp.int32).sum(axis=1)
    return mask_or_lens.astype(jnp.int32)


def _fwd(q, k, v, mask_or_lens):
    lens = _as_lens(mask_or_lens)
    return _forward_partitioned(q, k, v, lens), (q, k, v, lens)


def _fwd_local(q, k, v, mask_or_lens):
    lens = _as_lens(mask_or_lens)
    return _forward(q, k, v, lens), (q, k, v, lens)


def _bwd_local(res, g):
    q, k, v, lens = res
    if _bwd_fits_vmem(q.shape[1], q.shape[3]):
        dq, dk, dv = _backward_pallas(q, k, v, lens, g)
        return dq, dk, dv, None
    _, vjp = jax.vjp(lambda q, k, v: _attention_ref(q, k, v, lens), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


def _bwd_kernel(len_ref, q_ref, k_ref, v_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, T: int, G: int):
    """G (batch*head) rows per program (statically unrolled — same
    dispatch-overhead amortization as the forward): recompute
    P = softmax(QK^T m) in VMEM, then dV = P^T dO;
    dS = mask * P * (dP - rowsum(P*dP)); dQ = dS K s; dK = dS^T Q s.
    Mirrors the jnp reference VJP exactly, including the padded-row
    convention (fully-masked rows give uniform P into dV and zero dS into
    dQ/dK — the where() in the reference blocks that path)."""
    D = q_ref.shape[-1]
    scale = 1.0 / (D**0.5)
    for g in range(G):
        q = q_ref[g]
        k = k_ref[g]
        v = v_ref[g]
        do = do_ref[g]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [T, T]
        n = len_ref[pl.program_id(0) * G + g]
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        mask = col < n
        s = jnp.where(mask, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)  # [T, T] f32

        dof = do.astype(jnp.float32)
        dv = jax.lax.dot_general(  # P^T @ dO
            p, dof, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(  # dO @ V^T
            dof, v.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        d_row = jnp.sum(p * dp, axis=-1, keepdims=True)
        ds = jnp.where(mask, p * (dp - d_row), 0.0)
        dq = jax.lax.dot_general(  # dS @ K
            ds, k.astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        dk = jax.lax.dot_general(  # dS^T @ Q
            ds, q.astype(jnp.float32),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        dq_ref[g] = dq.astype(dq_ref.dtype)
        dk_ref[g] = dk.astype(dk_ref.dtype)
        dv_ref[g] = dv.astype(dv_ref.dtype)


# The backward holds one T x T f32 score matrix plus (P, dS) scratch and
# six [T, D] stripes in VMEM; stay well under the ~16 MB/core budget.
_BWD_VMEM_BUDGET = 10 * 1024 * 1024


def _bwd_fits_vmem(T: int, D: int) -> bool:
    return (3 * T * T + 7 * T * D) * 4 <= _BWD_VMEM_BUDGET


def _bwd_fold_rows(BH: int, T: int, D: int, itemsize: int) -> int:
    """Largest G <= 8 dividing B*H that keeps the seven [T, D] stripes per
    row (double-buffered) plus the per-iteration [T, T] f32 scratch under
    budget.  The scratch is reused across the unrolled G iterations, so it
    counts once."""
    for G in (8, 6, 4, 3, 2):
        if BH % G:
            continue
        stripes = 7 * T * D * G * itemsize * 2
        if stripes + 3 * T * T * 4 <= _BWD_VMEM_BUDGET:
            return G
    return 1


def _backward_pallas(q, k, v, lens, g, interpret: bool | None = None):
    B, T, H, D = q.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    qf = q.transpose(0, 2, 1, 3).reshape(B * H, T, D)
    kf = k.transpose(0, 2, 1, 3).reshape(B * H, T, D)
    vf = v.transpose(0, 2, 1, 3).reshape(B * H, T, D)
    gf = g.transpose(0, 2, 1, 3).reshape(B * H, T, D)
    lens_bh = jnp.repeat(lens.astype(jnp.int32), H)
    G = _bwd_fold_rows(B * H, T, D, q.dtype.itemsize)
    spec = pl.BlockSpec(
        (G, T, D), lambda bh, lens: (bh, 0, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * H // G,),
        in_specs=[spec] * 4,
        out_specs=[spec] * 3,
    )
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, T=T, G=G),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B * H, T, D), q.dtype)] * 3,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=10 * B * H * T * T * D,
            bytes_accessed=4 * 7 * B * T * H * D,
            transcendentals=B * H * T * T,
        ),
    )(lens_bh, qf, kf, vf, gf)
    unflat = lambda x: x.reshape(B, H, T, D).transpose(0, 2, 1, 3)
    return unflat(dq), unflat(dk), unflat(dv)


@custom_partitioning
def _backward_partitioned(q, k, v, lens, g):
    return _backward_pallas(q, k, v, lens, g)


def _bwd_partition(mesh, arg_shapes, result_shape):
    qkv, lens = _attn_specs(mesh, arg_shapes)

    def lower_fn(q, k, v, l, g):
        return _backward_pallas(q, k, v, l, g)

    return mesh, lower_fn, (qkv, qkv, qkv), (qkv, qkv, qkv, lens, qkv)


_backward_partitioned.def_partition(
    partition=_bwd_partition,
    infer_sharding_from_operands=lambda mesh, arg_shapes, result_shape: (
        lambda s: (s, s, s)
    )(_attn_specs(mesh, arg_shapes)[0]),
    sharding_rule=(
        "b t h d, b t h d, b t h d, b, b t h d -> b t h d, b t h d, b t h d"
    ),
    need_replication_factors=("t", "d"),
)


def _bwd(res, g):
    q, k, v, lens = res
    B, T, H, D = q.shape
    if _bwd_fits_vmem(T, D):
        dq, dk, dv = _backward_partitioned(q, k, v, lens, g)
        return dq, dk, dv, None
    # Fallback: rematerialized backward through the jnp reference (same
    # math, but the T^2 attention matrix round-trips HBM).
    _, vjp = jax.vjp(lambda q, k, v: _attention_ref(q, k, v, lens), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


flash_attention.defvjp(_fwd, _bwd)
flash_attention_local.defvjp(_fwd_local, _bwd_local)

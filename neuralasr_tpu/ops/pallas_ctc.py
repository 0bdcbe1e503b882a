"""Pallas CTC forward-backward kernels (VERDICT r2 item 2b).

The XLA-scan CTC in ctc/loss.py is numerically final but latency-bound on
TPU: ~240 sequential scan iterations of tiny [B, S] VPU work cost ~2.6 ms
per step at batch 64 while moving only ~15 GB/s.  These kernels run the
SAME recursions as single `pallas_call`s — grid over time, the [B, S]
lattice state living in a VMEM scratch that persists across sequential
grid steps — so the per-iteration cost is a handful of VPU ops instead of
an XLA loop iteration.

Design notes (all 2-D vectors; Mosaic-safe):
  - Emissions em_t[b,s] = lp_t[b, ext[b,s]] are rebuilt per step as V
    unrolled select-accumulates over the [B, S] lattice (V ~ 30); no
    gather, no [T, B, S] or [B, S, V] tensor anywhere.
  - The s-1 / s-2 shifts of the alpha/beta recursions are lane rolls with
    edge masks.
  - The backward kernel walks the grid REVERSED (index maps t = T-1-i),
    carries beta in scratch, and emits the per-class occupancy [B, V]
    directly (again V select-reductions), so betas never leave VMEM.

Masks arrive as f32 (0/1) tensors; lengths as [B, 1] int32 in VMEM.
Everything is f32 internally (log-space).  Off-TPU the kernels run in
interpret mode; parity vs the XLA scan path is pinned by
tests/test_pallas_ctc.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _lse3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    return m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m) + jnp.exp(c - m))


def _emission(lp, ext, V):
    """em[b, s] = lp[b, ext[b, s]] as V unrolled select-accumulates."""
    em = jnp.zeros(ext.shape, jnp.float32)
    for v in range(V):
        em = em + jnp.where(ext == v, lp[:, v][:, None], 0.0)
    return em


def _shift_right(x, n, fill):
    """x[:, s] <- x[:, s-n] with fill for s < n (lane roll + edge mask)."""
    rolled = pltpu.roll(x, shift=n, axis=1)
    s_idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(s_idx < n, fill, rolled)


def _shift_left(x, n, fill):
    S = x.shape[1]
    # pltpu.roll only takes non-negative shifts: left-by-n == right-by-S-n.
    rolled = pltpu.roll(x, shift=S - n, axis=1)
    s_idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(s_idx >= S - n, fill, rolled)


def _alpha_kernel(
    lp_ref, ext_ref, skip_ref, valid_ref, lens_ref, llen_ref,
    ll_ref, alphas_ref, alpha_scr, *, V,
):
    t = pl.program_id(0)
    T = pl.num_programs(0)
    ext = ext_ref[:]
    em = _emission(lp_ref[0], ext, V)
    valid = valid_ref[:] > 0.5
    s_idx = jax.lax.broadcasted_iota(jnp.int32, ext.shape, 1)
    has_label = llen_ref[:] > 0  # [B, 1]

    @pl.when(t == 0)
    def _():
        alpha = jnp.where(s_idx == 0, em, NEG_INF)
        alpha = jnp.where((s_idx == 1) & has_label, em, alpha)
        alpha_scr[:] = jnp.where(valid, alpha, NEG_INF)

    @pl.when(t > 0)
    def _():
        alpha = alpha_scr[:]
        a1 = _shift_right(alpha, 1, NEG_INF)
        a2 = jnp.where(
            skip_ref[:] > 0.5, _shift_right(alpha, 2, NEG_INF), NEG_INF
        )
        new = _lse3(alpha, a1, a2) + em
        new = jnp.where(valid, new, NEG_INF)
        active = t < lens_ref[:]  # [B, 1]
        alpha_scr[:] = jnp.where(active, new, alpha)

    alphas_ref[0] = alpha_scr[:]

    @pl.when(t == T - 1)
    def _():
        alpha = alpha_scr[:]
        last = 2 * llen_ref[:]  # [B, 1]
        a_last = jnp.max(
            jnp.where(s_idx == last, alpha, NEG_INF), axis=1, keepdims=True
        )
        a_prev = jnp.max(
            jnp.where((s_idx == last - 1) & has_label, alpha, NEG_INF),
            axis=1, keepdims=True,
        )
        m = jnp.maximum(a_last, a_prev)
        ll_ref[:] = m + jnp.log(jnp.exp(a_last - m) + jnp.exp(a_prev - m))


def ctc_alpha_forward(lp, ext, allow_skip, state_valid, input_lens, label_lens):
    """lp [T,B,V] f32 time-major log-probs -> (ll [B], alphas [T,B,S])."""
    T, B, V = lp.shape
    S = ext.shape[1]
    interpret = jax.default_backend() != "tpu"
    full = lambda shape: pl.BlockSpec(
        shape, lambda t: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    ll, alphas = pl.pallas_call(
        functools.partial(_alpha_kernel, V=V),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, V), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            full((B, S)),  # ext
            full((B, S)),  # allow_skip (f32)
            full((B, S)),  # state_valid (f32)
            full((B, 1)),  # input_lens
            full((B, 1)),  # label_lens
        ],
        out_specs=(
            pl.BlockSpec((B, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, S), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((T, B, S), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((B, S), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=T * B * S * (V + 12),
            bytes_accessed=4 * (T * B * V + 2 * T * B * S),
            transcendentals=4 * T * B * S,
        ),
    )(
        lp,
        ext.astype(jnp.int32),
        allow_skip.astype(jnp.float32),
        state_valid.astype(jnp.float32),
        input_lens.astype(jnp.int32)[:, None],
        label_lens.astype(jnp.int32)[:, None],
    )
    return ll[:, 0], alphas


def _beta_occ_kernel(
    lp_next_ref, alphas_ref, ext_ref, skipout_ref, valid_ref, lens_ref,
    llen_ref, ll_ref, occ_ref, beta_scr, *, V, T,
):
    i = pl.program_id(0)
    t = T - 1 - i
    ext = ext_ref[:]
    valid = valid_ref[:] > 0.5
    s_idx = jax.lax.broadcasted_iota(jnp.int32, ext.shape, 1)
    last = 2 * llen_ref[:]  # [B, 1]
    fin = jnp.where(
        (s_idx == last) | ((s_idx == last - 1) & (llen_ref[:] > 0)),
        0.0,
        NEG_INF,
    )

    @pl.when(i == 0)
    def _():
        beta_scr[:] = fin

    @pl.when(i > 0)
    def _():
        em_next = _emission(lp_next_ref[0], ext, V)
        x0 = beta_scr[:] + em_next
        x1 = _shift_left(x0, 1, NEG_INF)
        x2 = jnp.where(
            skipout_ref[:] > 0.5, _shift_left(x0, 2, NEG_INF), NEG_INF
        )
        new = _lse3(x0, x1, x2)
        new = jnp.where(valid, new, NEG_INF)
        at_or_past_end = t >= lens_ref[:] - 1  # [B, 1]
        beta_scr[:] = jnp.where(at_or_past_end, fin, new)

    # Occupancy for this t: w = exp(alpha + beta - ll), per-class sums.
    gamma = alphas_ref[0] + beta_scr[:]
    feasible = ll_ref[:] > NEG_INF / 2  # [B, 1]
    w = jnp.where(feasible, jnp.exp(gamma - ll_ref[:]), 0.0)
    w = jnp.where(t < lens_ref[:], w, 0.0)
    occ = jnp.zeros((ext.shape[0], occ_ref.shape[2]), jnp.float32)
    v_idx = jax.lax.broadcasted_iota(jnp.int32, occ.shape, 1)
    for v in range(V):
        contrib = jnp.sum(jnp.where(ext == v, w, 0.0), axis=1, keepdims=True)
        occ = occ + jnp.where(v_idx == v, contrib, 0.0)
    occ_ref[0] = occ


def ctc_beta_occupancy(
    lp, alphas, ext, allow_skip, state_valid, input_lens, label_lens, ll
):
    """Reverse recursion with fused occupancy.  Returns occ [T,B,V]."""
    T, B, V = lp.shape
    S = ext.shape[1]
    # Skip OUT of s into s+2 is allowed iff skip INTO s+2 is (shift left).
    skip_out = jnp.concatenate(
        [allow_skip[:, 2:], jnp.zeros((B, 2), allow_skip.dtype)], axis=1
    )
    interpret = jax.default_backend() != "tpu"
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    # Program i handles t = T-1-i and needs lp[t+1] (clamped at i=0, where
    # the block is loaded but unused) and alphas[t].
    occ = pl.pallas_call(
        functools.partial(_beta_occ_kernel, V=V, T=T),
        grid=(T,),
        in_specs=[
            pl.BlockSpec(
                (1, B, V),
                lambda i, T=T: (jnp.minimum(T - i, T - 1), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, B, S),
                lambda i, T=T: (T - 1 - i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            full((B, S)),  # ext
            full((B, S)),  # skip_out (f32)
            full((B, S)),  # state_valid (f32)
            full((B, 1)),  # input_lens
            full((B, 1)),  # label_lens
            full((B, 1)),  # ll
        ],
        out_specs=pl.BlockSpec(
            (1, B, V), lambda i, T=T: (T - 1 - i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((T, B, V), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, S), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * T * B * S * (V + 12),
            bytes_accessed=4 * (2 * T * B * V + 2 * T * B * S),
            transcendentals=5 * T * B * S,
        ),
    )(
        lp,
        alphas,
        ext.astype(jnp.int32),
        skip_out.astype(jnp.float32),
        state_valid.astype(jnp.float32),
        input_lens.astype(jnp.int32)[:, None],
        label_lens.astype(jnp.int32)[:, None],
        ll.astype(jnp.float32)[:, None],
    )
    return occ

"""Vectorized CTC prefix beam search, fully on-device.

TPU-first redesign of the reference's C++ `ctc_beam_search.h` (SURVEY.md §3
item 2, §4.5): instead of a per-prefix hash map grown dynamically, the beam
state is fixed-shape tensors scanned over time —

  prefixes [W, Lmax] int32   p_b [W]   p_nb [W]   lens [W]   hash [W, 2]

Per frame: W "stay" candidates (emit blank / repeat last char) and W*V
"extend" candidates are scored on the VPU; duplicate prefixes (an extension
of beam i equal to existing beam j) are merged via a pair of incremental
32-bit polynomial rolling hashes (collision probability ~2^-64 per pair) —
and `lax.top_k` over the W*(V+1) candidates selects the next beam.

Merge implementations, A/B'd on a v5e (runs/bench_suite.jsonl, round 3):
the default "allpairs" [W, V, W] match tensor is asymptotically worse
(O(W^2 V)) but VECTOR-shaped — pure VPU compares/reduces — and measures
12-13x FASTER than the "sort" variant (argsort + binary search + gathers,
O(W V log W) scalar-ish work the TPU hates) at BOTH width 16 (12.9k vs
1.07k audio-s/s) and width 64 (2.96k vs 0.23k).  The sort variant stays
available for exotic widths/backends; the all-pairs tensor is the measured
deliberate choice on TPU (VERDICT r2 item 10).  Optional
shallow fusion adds `lm_logp(prefix_context) -> [V]` scores to extensions
(config 4, neuralasr_tpu/ctc/lm_fusion.py).

Batched with vmap; frames past `input_lens` carry state through unchanged.
Host oracle for triage: neuralasr_tpu/reference/beam_oracle.py.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30
_P1 = jnp.uint32(1000003)
_P2 = jnp.uint32(2654435761)


def _lse(a, b):
    m = jnp.maximum(a, b)
    return m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m))


def _masked_lse_reduce(x, mask, axis):
    """logsumexp of x where mask else -inf, along axis. Safe at all-dead."""
    x = jnp.where(mask, x, NEG_INF)
    m = jnp.max(x, axis=axis, keepdims=True)
    s = jnp.sum(jnp.exp(x - m) * mask, axis=axis)
    return jnp.squeeze(m, axis) + jnp.log(jnp.maximum(s, 1e-38))


def _merge_allpairs(hashes, ext_h1, ext_h2, ext_pnb, W):
    """All-pairs [W, V, W] hash match.  O(W^2 V) work per frame — simple
    and branch-free; fine at W=16, quadratic-in-beam at larger widths."""
    match = (
        (ext_h1[:, :, None] == hashes[None, None, :, 0])
        & (ext_h2[:, :, None] == hashes[None, None, :, 1])
        & (ext_pnb[:, :, None] > NEG_INF / 2)
    )  # [W, V, W]
    merged_in = _masked_lse_reduce(
        jnp.broadcast_to(ext_pnb[:, :, None], match.shape).reshape(-1, W),
        match.reshape(-1, W),
        axis=0,
    )  # [W]
    return merged_in, match.any(axis=2)


def _merge_sorted(hashes, ext_h1, ext_h2, ext_pnb, last, W):
    """Sort-based merge (VERDICT r2 item 10): binary-search each extension's
    hash in the h1-sorted beam list — O(W V log W) compares — then fold
    matched mass per target beam over the single column c = last[target]
    (an extension equal to beam w2 necessarily ends in w2's last char), an
    O(W^2) reduce with no [W, V, W] tensor.

    Collision accounting: a FALSE merge still needs both 32-bit hashes to
    collide (~2^-64, same as the all-pairs path).  A MISSED merge
    additionally requires two distinct live beams to share h1 (~W^2 2^-32
    per step) — and costs only a slightly split score, not corruption.
    """
    order = jnp.argsort(hashes[:, 0])  # [W]
    h1_sorted = hashes[order, 0]
    pos = jnp.searchsorted(h1_sorted, ext_h1)  # [W, V] in [0, W]
    cand = order[jnp.clip(pos, 0, W - 1)]  # candidate beam per extension
    ok = (
        (pos < W)
        & (hashes[cand, 0] == ext_h1)
        & (hashes[cand, 1] == ext_h2)
        & (ext_pnb > NEG_INF / 2)
    )  # [W, V]
    m = jnp.where(ok, cand, W)  # matched beam index, W = none

    # Fold: target w2 can only absorb extensions in column last[w2].
    ext_col = jnp.take(ext_pnb, last, axis=1)  # [W_src, W_tgt]
    m_col = jnp.take(m, last, axis=1)  # [W_src, W_tgt]
    mask = m_col == jnp.arange(W)[None, :]
    merged_in = _masked_lse_reduce(ext_col, mask, axis=0)  # [W]
    return merged_in, m < W


def _beam_step(
    state, inputs, *, W, V, Lmax, blank_id, lm_fn, lm_weight, merge_impl
):
    prefixes, lens, p_b, p_nb, hashes, active = state
    lp = inputs  # [V] frame log-probs

    total = _lse(p_b, p_nb)  # [W]
    last = jnp.take_along_axis(
        prefixes, jnp.maximum(lens - 1, 0)[:, None], axis=1
    )[:, 0]  # [W]
    has_len = lens > 0

    # ---- stay candidates (prefix unchanged) ----
    stay_pb = total + lp[blank_id]
    stay_pnb = jnp.where(has_len, p_nb + lp[last], NEG_INF)

    # ---- extend candidates (prefix + c), [W, V] ----
    lm_add = lm_weight * lm_fn(prefixes, lens) if lm_fn is not None else 0.0
    is_last = jnp.arange(V)[None, :] == last[:, None]  # [W, V]
    base = jnp.where(is_last & has_len[:, None], p_b[:, None], total[:, None])
    ext_pnb = base + lp[None, :] + lm_add  # [W, V]
    ext_pnb = ext_pnb.at[:, blank_id].set(NEG_INF)
    # Extensions past Lmax are dropped (cap; utterances here never hit it).
    ext_pnb = jnp.where(lens[:, None] >= Lmax, NEG_INF, ext_pnb)

    c_ids = jnp.arange(V, dtype=jnp.uint32)[None, :]
    ext_h1 = hashes[:, 0:1] * _P1 + (c_ids + 1)  # [W, V]
    ext_h2 = hashes[:, 1:2] * _P2 + (c_ids + 1)

    # ---- merge extensions that equal an existing beam's prefix ----
    if merge_impl == "sort":
        merged_in, killed = _merge_sorted(
            hashes, ext_h1, ext_h2, ext_pnb, last, W
        )
    else:
        merged_in, killed = _merge_allpairs(
            hashes, ext_h1, ext_h2, ext_pnb, W
        )
    # Fold matched extension mass into the matching stay candidate's p_nb,
    # then kill the merged extension candidates.
    stay_pnb = _lse(stay_pnb, merged_in)
    ext_pnb = jnp.where(killed, NEG_INF, ext_pnb)

    # ---- top-k over W stay + W*V extend candidates ----
    cand_pb = jnp.concatenate([stay_pb, jnp.full((W * V,), NEG_INF)])
    cand_pnb = jnp.concatenate([stay_pnb, ext_pnb.reshape(-1)])
    cand_total = _lse(cand_pb, cand_pnb)
    scores, top = jax.lax.top_k(cand_total, W)  # [W]

    is_stay = top < W
    src = jnp.where(is_stay, top, (top - W) // V)  # source beam index
    c_new = jnp.where(is_stay, 0, (top - W) % V).astype(jnp.int32)

    new_prefixes = prefixes[src]  # [W, Lmax]
    new_lens = lens[src] + jnp.where(is_stay, 0, 1)
    pos = jnp.clip(lens[src], 0, Lmax - 1)
    updated = new_prefixes.at[jnp.arange(W), pos].set(c_new)
    new_prefixes = jnp.where(is_stay[:, None], new_prefixes, updated)
    new_h1 = jnp.where(
        is_stay,
        hashes[src, 0],
        hashes[src, 0] * _P1 + (c_new.astype(jnp.uint32) + 1),
    )
    new_h2 = jnp.where(
        is_stay,
        hashes[src, 1],
        hashes[src, 1] * _P2 + (c_new.astype(jnp.uint32) + 1),
    )
    new_hashes = jnp.stack([new_h1, new_h2], axis=1)
    new_pb = cand_pb[top]
    new_pnb = cand_pnb[top]

    # ---- length masking: carry state through for padded frames ----
    def keep_old(_):
        return state

    def take_new(_):
        return (new_prefixes, new_lens, new_pb, new_pnb, new_hashes, active)

    new_state = jax.lax.cond(active, take_new, keep_old, None)
    return new_state, None


def _beam_step_pruned(
    state, inputs, *, W, K, Lmax, blank_id
):
    """Per-frame top-K column pre-prune (VERDICT r3 item 8): extension
    candidates are restricted to the frame's K best characters, shrinking
    the per-frame work from W*(V+1) candidates + a [W, V, W] merge tensor
    to W*(K+1) + [W, K, W].

    EXACT for lm_fn=None at K >= W+2: extension scores are base + lp[c]
    with base in {total, p_b <= total}, so for any extension whose char is
    outside the frame's top-(W+1) non-blank columns, at least W same-source
    extensions with higher lp (at most one of which swaps total for p_b)
    weakly outrank it — it cannot enter the top-W.  Merge mass is computed
    EXACTLY from the [W, W] column tensor (an extension equal to beam tgt
    necessarily ends in last[tgt]), so dropped columns lose no probability.
    """
    prefixes, lens, p_b, p_nb, hashes, active = state
    lp, top_ids = inputs  # [V] frame log-probs, [K] top char ids

    total = _lse(p_b, p_nb)  # [W]
    last = jnp.take_along_axis(
        prefixes, jnp.maximum(lens - 1, 0)[:, None], axis=1
    )[:, 0]  # [W]
    has_len = lens > 0

    stay_pb = total + lp[blank_id]
    stay_pnb = jnp.where(has_len, p_nb + lp[last], NEG_INF)

    # ---- extend candidates over the frame's top-K columns, [W, K] ----
    lpk = lp[top_ids]  # [K]
    is_last = top_ids[None, :] == last[:, None]  # [W, K]
    base = jnp.where(is_last & has_len[:, None], p_b[:, None], total[:, None])
    ext_pnb = base + lpk[None, :]
    ext_pnb = jnp.where(top_ids[None, :] == blank_id, NEG_INF, ext_pnb)
    ext_pnb = jnp.where(lens[:, None] >= Lmax, NEG_INF, ext_pnb)

    ids_u = top_ids.astype(jnp.uint32)
    ext_h1 = hashes[:, 0:1] * _P1 + (ids_u[None, :] + 1)  # [W, K]
    ext_h2 = hashes[:, 1:2] * _P2 + (ids_u[None, :] + 1)

    # ---- EXACT merge from the [W_src, W_tgt] column tensor ----
    last_u = last.astype(jnp.uint32)
    col_is_last = last[None, :] == last[:, None]  # [src, tgt]
    col_base = jnp.where(
        col_is_last & has_len[:, None], p_b[:, None], total[:, None]
    )
    col_pnb = col_base + lp[last][None, :]
    col_pnb = jnp.where(last[None, :] == blank_id, NEG_INF, col_pnb)
    col_pnb = jnp.where(lens[:, None] >= Lmax, NEG_INF, col_pnb)
    match2 = (
        (hashes[:, 0:1] * _P1 + last_u[None, :] + 1 == hashes[None, :, 0])
        & (hashes[:, 1:2] * _P2 + last_u[None, :] + 1 == hashes[None, :, 1])
        & (col_pnb > NEG_INF / 2)
    )  # [src, tgt]
    merged_in = _masked_lse_reduce(col_pnb, match2, axis=0)  # [W_tgt]
    stay_pnb = _lse(stay_pnb, merged_in)

    killed = (
        (ext_h1[:, :, None] == hashes[None, None, :, 0])
        & (ext_h2[:, :, None] == hashes[None, None, :, 1])
        & (ext_pnb[:, :, None] > NEG_INF / 2)
    ).any(axis=2)  # [W, K]
    ext_pnb = jnp.where(killed, NEG_INF, ext_pnb)

    # ---- top-k over W stay + W*K extend candidates ----
    cand_pb = jnp.concatenate([stay_pb, jnp.full((W * K,), NEG_INF)])
    cand_pnb = jnp.concatenate([stay_pnb, ext_pnb.reshape(-1)])
    cand_total = _lse(cand_pb, cand_pnb)
    scores, top = jax.lax.top_k(cand_total, W)

    is_stay = top < W
    src = jnp.where(is_stay, top, (top - W) // K)
    kk = jnp.where(is_stay, 0, (top - W) % K)
    c_new = jnp.where(is_stay, 0, top_ids[kk]).astype(jnp.int32)

    new_prefixes = prefixes[src]
    new_lens = lens[src] + jnp.where(is_stay, 0, 1)
    pos = jnp.clip(lens[src], 0, Lmax - 1)
    updated = new_prefixes.at[jnp.arange(W), pos].set(c_new)
    new_prefixes = jnp.where(is_stay[:, None], new_prefixes, updated)
    new_h1 = jnp.where(
        is_stay,
        hashes[src, 0],
        hashes[src, 0] * _P1 + (c_new.astype(jnp.uint32) + 1),
    )
    new_h2 = jnp.where(
        is_stay,
        hashes[src, 1],
        hashes[src, 1] * _P2 + (c_new.astype(jnp.uint32) + 1),
    )
    new_hashes = jnp.stack([new_h1, new_h2], axis=1)
    new_pb = cand_pb[top]
    new_pnb = cand_pnb[top]

    def keep_old(_):
        return state

    def take_new(_):
        return (new_prefixes, new_lens, new_pb, new_pnb, new_hashes, active)

    return jax.lax.cond(active, take_new, keep_old, None), None


@partial(jax.jit, static_argnames=("blank_id",))
def blank_collapse(
    log_probs: jnp.ndarray,  # [B, T, V]
    input_lens: jnp.ndarray,  # [B]
    threshold: float = 0.999,
    blank_id: int = 0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Emission compression (PAPERS.md: "Blank Collapse", arXiv 2210.17017):
    drop frames whose blank posterior exceeds `threshold` — they extend no
    prefix and only rescale beams (approximately) uniformly.  Typical CTC
    emissions are ~60-80% high-blank frames, so the sequential beam scan
    shrinks by that factor.  Fixed shapes: frames are left-compacted with the
    argsort trick and new lengths returned; padding frames keep harmless
    high-blank content.
    """
    B, T, V = log_probs.shape
    t_idx = jnp.arange(T)[None, :]
    valid = t_idx < input_lens[:, None]
    keep = (log_probs[:, :, blank_id] < jnp.log(threshold)) & valid
    key = jnp.where(keep, t_idx, t_idx + T)
    order = jnp.argsort(key, axis=1)  # stable: kept frames first, in order
    lp_c = jnp.take_along_axis(log_probs, order[:, :, None], axis=1)
    new_lens = keep.sum(axis=1).astype(jnp.int32)
    return lp_c, new_lens


@partial(
    jax.jit,
    static_argnames=(
        "beam_width", "blank_id", "max_label_len", "lm_fn", "merge_impl",
        "prune_k",
    ),
)
def beam_search_decode(
    logits: jnp.ndarray,  # [B, T, V]
    input_lens: jnp.ndarray,  # [B]
    beam_width: int = 16,
    blank_id: int = 0,
    max_label_len: int = 256,
    lm_fn: Optional[Callable] = None,  # (prefixes [W,L], lens [W]) -> [W,V]
    lm_weight: float = 0.0,
    merge_impl: str = "allpairs",  # "allpairs" (vector, fast on TPU) | "sort"
    # 0 = full-V extensions; >0 restricts extensions to each frame's
    # prune_k best characters (EXACT at prune_k >= W+2 without LM; see
    # _beam_step_pruned).  -1 = auto: min(V, W+2) when lm_fn is None.
    # With lm_fn set the per-source column ordering differs (lm_add), so
    # pruning is disabled (full-V path).
    prune_k: int = 0,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched prefix beam search.

    Returns (prefixes [B, W, Lmax], lens [B, W], scores [B, W]), beams
    sorted best-first per row.

    Interactions (ADVICE r4): `prune_k > 0` routes to _beam_step_pruned,
    which always merges with the all-pairs hash tensor — a `merge_impl=
    "sort"` request is ignored on that path (the sort merge measured
    12-13x slower on TPU and was never ported to the pruned step).  An
    active `lm_fn` disables pruning entirely (per-source column ordering
    differs under lm_add), falling back to the full-V step, where
    `merge_impl` is honored.
    """
    B, T, V = logits.shape
    W, Lmax = beam_width, max_label_len
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    if prune_k == -1:
        prune_k = min(V, W + 2)
    use_prune = prune_k > 0 and prune_k < V and lm_fn is None
    if use_prune:
        _, top_ids_bt = jax.lax.top_k(log_probs, prune_k)  # [B, T, K]
    else:
        top_ids_bt = jnp.zeros((B, T, 1), jnp.int32)  # unused placeholder

    def decode_one(lp, n, top_ids):
        prefixes = jnp.zeros((W, Lmax), dtype=jnp.int32)
        lens = jnp.zeros((W,), dtype=jnp.int32)
        p_b = jnp.full((W,), NEG_INF).at[0].set(0.0)
        p_nb = jnp.full((W,), NEG_INF)
        # Dead beams get distinct sentinel hashes so they never merge.
        sent = (jnp.arange(W, dtype=jnp.uint32) + 1) * jnp.uint32(0x9E3779B9)
        h = jnp.stack([sent, sent], axis=1).at[0].set(jnp.uint32(0))

        def step(state, xs):
            lp_t, ids_t, t = xs
            s = (*state[:5], t < n)
            if use_prune:
                out, _ = _beam_step_pruned(
                    s,
                    (lp_t, ids_t),
                    W=W,
                    K=prune_k,
                    Lmax=Lmax,
                    blank_id=blank_id,
                )
            else:
                out, _ = _beam_step(
                    s,
                    lp_t,
                    W=W,
                    V=V,
                    Lmax=Lmax,
                    blank_id=blank_id,
                    lm_fn=lm_fn,
                    lm_weight=lm_weight,
                    merge_impl=merge_impl,
                )
            return out[:5], None

        init = (prefixes, lens, p_b, p_nb, h)
        (prefixes, lens, p_b, p_nb, h), _ = jax.lax.scan(
            step, init, (lp, top_ids, jnp.arange(T))
        )
        scores = _lse(p_b, p_nb)
        order = jnp.argsort(-scores)
        return prefixes[order], lens[order], scores[order]

    return jax.vmap(decode_one)(log_probs, input_lens, top_ids_bt)

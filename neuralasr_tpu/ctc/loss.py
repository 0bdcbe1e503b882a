"""CTC loss as a length-masked log-space scan (the BASELINE.json north-star
kernel).

TPU-first design, not a port of TF's `ctc_loss_calculator.h` (SURVEY.md §3
item 1):

- Fixed shapes: labels padded to Lmax, the expanded-state lattice is a fixed
  [B, S=2*Lmax+1] tensor; all batching is dense (no SparseTensor — that is a
  TF-1.x artifact).
- One `lax.scan` over time computes the alpha recursion for the whole batch
  on the VPU.  Emissions are gathered INSIDE the scan body from the [B, V]
  frame of log-probs via a precomputed one-hot [B, S, V] contraction —
  never materialized as a [T, B, S] tensor.  With V ≈ 30 and S ≈ 2L+1 ≈ 6V,
  the round-2 pre-gather inflated HBM traffic ~6x and made the stage
  bandwidth-bound at 67 GB/s (VERDICT r2 item 2b); in-body gather keeps the
  streamed operand at the [T, B, V] log-probs (~1.5 MB for the bench
  bucket), which XLA pins in VMEM across the fused scan.
- Length masking: frames past `input_lens` carry alpha through unchanged;
  states past each row's true 2L+1 never influence the final gather.
- Gradient: analytic alpha-beta custom_vjp.  The backward fuses the
  occupancy accumulation into the beta scan: each step emits the [B, V]
  per-class occupancy directly (one [B,S]x[B,S,V] contraction), so betas
  are ALSO never materialized — residual HBM traffic is alphas [T, B, S]
  plus the log-probs, nothing else.

Blank id = 0 (package convention, neuralasr_tpu/text.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _logsumexp3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    # With the -1e30 sentinel, exp(x - m) underflows to 0 for dead paths and
    # m + log(k) stays ~-1e30 when all three are dead: no NaNs, no raw -inf.
    return m + jnp.log(
        jnp.exp(a - m) + jnp.exp(b - m) + jnp.exp(c - m)
    )


def expand_labels(labels: jnp.ndarray, blank_id: int = 0) -> jnp.ndarray:
    """[B, L] -> [B, 2L+1] with interleaved blanks: [b, l1, b, ..., lL, b]."""
    B, L = labels.shape
    ext = jnp.full((B, 2 * L + 1), blank_id, dtype=labels.dtype)
    return ext.at[:, 1::2].set(labels)


def ctc_forward(
    log_probs: jnp.ndarray,  # [B, T, V] per-frame log-posteriors
    labels: jnp.ndarray,  # [B, L] int32, padded with blank past label_lens
    input_lens: jnp.ndarray,  # [B] int32
    label_lens: jnp.ndarray,  # [B] int32
    blank_id: int = 0,
) -> jnp.ndarray:
    """Log-likelihood log p(labels | log_probs) per utterance. Shape [B]."""
    B, T, V = log_probs.shape
    L = labels.shape[1]
    ext, allow_skip, state_valid = _lattice(labels, label_lens, blank_id, B, L)
    onehot = jax.nn.one_hot(ext, V, dtype=log_probs.dtype)  # [B, S, V]
    lp = jnp.transpose(log_probs, (1, 0, 2))  # [T, B, V]
    ll, _ = _alpha_scan(
        lp, onehot, input_lens, allow_skip, state_valid, label_lens,
        collect=False,
    )
    return ll


def ctc_loss(
    logits: jnp.ndarray,  # [B, T, V] raw logits
    labels: jnp.ndarray,  # [B, L]
    input_lens: jnp.ndarray,  # [B]
    label_lens: jnp.ndarray,  # [B]
    blank_id: int = 0,
    log_probs_in: bool = False,
    grad: str = "fb",  # "fb" = hand-written alpha-beta vjp; "autodiff"
    impl: str = "scan",  # "scan" (XLA lax.scan) | "pallas" (ops/pallas_ctc)
) -> jnp.ndarray:
    """Per-utterance CTC negative log-likelihood, shape [B].

    Matches neuralasr_tpu/reference/ctc_oracle.py (and tf.nn.ctc_loss up to
    the blank-id convention) allclose — tests/test_ctc_loss.py.

    grad="fb" uses the analytic alpha-beta gradient (the reference's C++
    `ctc_loss_calculator` computes exactly this): residuals are just the
    alpha lattice, the backward is one beta scan plus a per-class
    occupancy contraction — leaner than autodiff-through-scan.

    impl="pallas" runs both recursions as single Pallas kernels with the
    lattice state resident in VMEM (ops/pallas_ctc.py) — the same numbers
    (tests/test_pallas_ctc.py) without the XLA scan's per-iteration
    latency.  Only valid with grad="fb" and raw logits.
    """
    if grad == "fb" and not log_probs_in:
        if impl == "pallas":
            return _ctc_loss_fb_pallas(
                logits, labels, input_lens, label_lens, blank_id
            )
        if impl == "pallas_stream":
            return _ctc_loss_fb_pallas_stream(
                logits, labels, input_lens, label_lens, blank_id
            )
        return _ctc_loss_fb(logits, labels, input_lens, label_lens, blank_id)
    lp = logits if log_probs_in else jax.nn.log_softmax(logits, axis=-1)
    ll = ctc_forward(lp, labels, input_lens, label_lens, blank_id)
    return -ll


# ---------------- analytic alpha-beta gradient ----------------


def _lattice(labels, label_lens, blank_id, B, L):
    """Shared lattice tensors: ext labels, skip mask, state validity."""
    S = 2 * L + 1
    ext = expand_labels(labels.astype(jnp.int32), blank_id)  # [B, S]
    ext_m2 = jnp.concatenate(
        [jnp.full((B, 2), -1, dtype=ext.dtype), ext[:, :-2]], axis=1
    )
    allow_skip = (ext != blank_id) & (ext != ext_m2)
    allow_skip = allow_skip.at[:, :2].set(False)  # [B,S]: into s from s-2
    s_idx = jnp.arange(S)[None, :]
    state_valid = s_idx < (2 * label_lens[:, None] + 1)
    return ext, allow_skip, state_valid


def _emission(lp_frame, onehot):
    """Per-frame lattice emissions [B, S] from log-probs [B, V].

    One-hot contraction instead of take_along_axis: numerically identical
    (single 1.0 term per row), a few hundred KFLOP of fused VPU work per
    frame, and — the point — no [T, B, S] gather product ever touches HBM.
    """
    return jnp.einsum("bv,bsv->bs", lp_frame, onehot)


def _alpha_scan(
    lp, onehot, input_lens, allow_skip, state_valid, label_lens,
    collect: bool = True,
):
    """lp [T,B,V] time-major log-probs -> (ll [B], alphas [T,B,S] or None)."""
    T, B, _V = lp.shape
    S = onehot.shape[1]
    has_label = label_lens > 0
    em0 = _emission(lp[0], onehot)
    alpha0 = jnp.full((B, S), NEG_INF)
    alpha0 = alpha0.at[:, 0].set(em0[:, 0])
    alpha0 = alpha0.at[:, 1].set(jnp.where(has_label, em0[:, 1], NEG_INF))
    alpha0 = jnp.where(state_valid, alpha0, NEG_INF)
    neg_col = jnp.full((B, 1), NEG_INF)

    def step(alpha, xs):
        lp_frame, t = xs
        em_t = _emission(lp_frame, onehot)
        a1 = jnp.concatenate([neg_col, alpha[:, :-1]], axis=1)
        a2 = jnp.concatenate([neg_col, neg_col, alpha[:, :-2]], axis=1)
        a2 = jnp.where(allow_skip, a2, NEG_INF)
        new = _logsumexp3(alpha, a1, a2) + em_t
        new = jnp.where(state_valid, new, NEG_INF)
        active = (t < input_lens)[:, None]
        new = jnp.where(active, new, alpha)
        return new, (new if collect else None)

    ts = jnp.arange(1, T)
    alpha_T, alphas_rest = jax.lax.scan(step, alpha0, (lp[1:], ts), unroll=4)
    alphas = (
        jnp.concatenate([alpha0[None], alphas_rest], axis=0)
        if collect
        else None
    )

    last = (2 * label_lens).astype(jnp.int32)
    a_last = jnp.take_along_axis(alpha_T, last[:, None], axis=1)[:, 0]
    prev = jnp.clip(last - 1, 0, S - 1)
    a_prev = jnp.take_along_axis(alpha_T, prev[:, None], axis=1)[:, 0]
    a_prev = jnp.where(has_label, a_prev, NEG_INF)
    m = jnp.maximum(a_last, a_prev)
    ll = m + jnp.log(jnp.exp(a_last - m) + jnp.exp(a_prev - m))
    return ll, alphas


def _beta_occ_scan(
    lp, alphas, onehot, input_lens, allow_skip, state_valid, label_lens, ll
):
    """Reverse recursion, occupancy fused in.  Returns occ [T,B,V].

    beta_t(s) is defined so that gamma = alpha_t + beta_t satisfies
    logsumexp_s(gamma_t) = ll for every t < input_len.  The scan carries
    beta [B,S] and emits, per step, the per-class occupancy
    occ_t[b,v] = sum_s 1[ext[s]=v] * exp(gamma_t(s) - ll) — so the [T,B,S]
    beta lattice never reaches HBM; only the [T,B,V] occupancy (same shape
    as the gradient) does.
    """
    T, B, _V = lp.shape
    S = onehot.shape[1]
    # Final condition at t = len-1: 0 on states 2L and 2L-1.
    s_idx = jnp.arange(S)[None, :]
    last = (2 * label_lens)[:, None]
    fin = jnp.where(
        (s_idx == last) | ((s_idx == last - 1) & (label_lens[:, None] > 0)),
        0.0,
        NEG_INF,
    )  # [B, S]
    # Skip out of s into s+2 allowed iff allow_skip at s+2.
    skip_out = jnp.concatenate(
        [allow_skip[:, 2:], jnp.zeros((B, 2), dtype=bool)], axis=1
    )
    neg_col = jnp.full((B, 1), NEG_INF)
    feasible = ll > NEG_INF / 2  # [B]

    def occupancy(gamma, t):
        w = jnp.where(feasible[:, None], jnp.exp(gamma - ll[:, None]), 0.0)
        w = jnp.where((t < input_lens)[:, None], w, 0.0)
        return jnp.einsum("bs,bsv->bv", w, onehot)

    def step(beta_next, xs):
        lp_next, alpha_t, t = xs  # lp[t+1], alphas[t]
        em_next = _emission(lp_next, onehot)
        x0 = beta_next + em_next
        x1 = jnp.concatenate([x0[:, 1:], neg_col], axis=1)
        x2 = jnp.concatenate([x0[:, 2:], neg_col, neg_col], axis=1)
        x2 = jnp.where(skip_out, x2, NEG_INF)
        new = _logsumexp3(x0, x1, x2)
        new = jnp.where(state_valid, new, NEG_INF)
        # t >= len-1: clamp to the final condition (exact at t == len-1).
        at_or_past_end = (t >= input_lens - 1)[:, None]
        new = jnp.where(at_or_past_end, fin, new)
        return new, occupancy(alpha_t + new, t)

    ts = jnp.arange(T - 2, -1, -1)
    # beta at t consumes lp[t+1] and pairs with alphas[t], t = T-2..0.
    xs = (lp[1:][::-1], alphas[:-1][::-1], ts)
    _, occ_rev = jax.lax.scan(step, fin, xs, unroll=4)
    occ_last = occupancy(alphas[T - 1] + fin, T - 1)
    return jnp.concatenate([occ_rev[::-1], occ_last[None]], axis=0)


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _ctc_loss_fb(logits, labels, input_lens, label_lens, blank_id):
    lp = jax.nn.log_softmax(logits, axis=-1)
    ll = ctc_forward(lp, labels, input_lens, label_lens, blank_id)
    return -ll


def _ctc_fb_fwd(logits, labels, input_lens, label_lens, blank_id):
    B, T, V = logits.shape
    L = labels.shape[1]
    lp = jax.nn.log_softmax(logits, axis=-1)
    ext, allow_skip, state_valid = _lattice(labels, label_lens, blank_id, B, L)
    onehot = jax.nn.one_hot(ext, V, dtype=lp.dtype)  # [B, S, V]
    lp_tm = jnp.transpose(lp, (1, 0, 2))  # [T, B, V]
    ll, alphas = _alpha_scan(
        lp_tm, onehot, input_lens, allow_skip, state_valid, label_lens
    )
    res = (lp, alphas, ll, onehot, allow_skip, state_valid,
           input_lens, label_lens)
    return -ll, res


def _ctc_fb_bwd(blank_id, res, g):
    (lp, alphas, ll, onehot, allow_skip, state_valid,
     input_lens, label_lens) = res
    B, T, V = lp.shape
    lp_tm = jnp.transpose(lp, (1, 0, 2))  # [T, B, V]
    occ = _beta_occ_scan(
        lp_tm, alphas, onehot, input_lens, allow_skip, state_valid,
        label_lens, ll,
    )  # [T, B, V]
    occ = jnp.transpose(occ, (1, 0, 2))  # [B, T, V]
    # dloss/dlogits = softmax - occupancy (within length; zero outside).
    y = jnp.exp(lp)
    valid_t = (jnp.arange(T)[None, :] < input_lens[:, None])[:, :, None]
    grad = jnp.where(valid_t, y - occ, 0.0)
    # Softmax rows beyond length contribute nothing (occ=0 there, y != 0 —
    # hence the explicit mask above).
    grad = grad * g[:, None, None]
    return grad, None, None, None


_ctc_loss_fb.defvjp(_ctc_fb_fwd, _ctc_fb_bwd)


# ---------------- Pallas-kernel variant (ops/pallas_ctc.py) ----------------


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _ctc_loss_fb_pallas(logits, labels, input_lens, label_lens, blank_id):
    out, _ = _ctc_fb_pallas_fwd(
        logits, labels, input_lens, label_lens, blank_id
    )
    return out


def _ctc_fb_pallas_fwd(logits, labels, input_lens, label_lens, blank_id):
    from ..ops.pallas_ctc import ctc_alpha_forward

    B, T, V = logits.shape
    L = labels.shape[1]
    lp = jax.nn.log_softmax(logits, axis=-1)
    ext, allow_skip, state_valid = _lattice(labels, label_lens, blank_id, B, L)
    lp_tm = jnp.transpose(lp, (1, 0, 2)).astype(jnp.float32)
    ll, alphas = ctc_alpha_forward(
        lp_tm, ext, allow_skip, state_valid, input_lens, label_lens
    )
    res = (lp, alphas, ll, ext, allow_skip, state_valid,
           input_lens, label_lens)
    return -ll, res


def _ctc_fb_pallas_bwd(blank_id, res, g):
    from ..ops.pallas_ctc import ctc_beta_occupancy

    (lp, alphas, ll, ext, allow_skip, state_valid,
     input_lens, label_lens) = res
    B, T, V = lp.shape
    lp_tm = jnp.transpose(lp, (1, 0, 2)).astype(jnp.float32)
    occ = ctc_beta_occupancy(
        lp_tm, alphas, ext, allow_skip, state_valid,
        input_lens, label_lens, ll,
    )  # [T, B, V]
    occ = jnp.transpose(occ, (1, 0, 2))
    y = jnp.exp(lp)
    valid_t = (jnp.arange(T)[None, :] < input_lens[:, None])[:, :, None]
    grad = jnp.where(valid_t, y - occ, 0.0) * g[:, None, None]
    return grad.astype(lp.dtype), None, None, None


_ctc_loss_fb_pallas.defvjp(_ctc_fb_pallas_fwd, _ctc_fb_pallas_bwd)


# ------------- zero-dispatch streaming Pallas variant (round 4) -------------
#
# Same recursions as "pallas", but each direction is ONE grid-free Pallas
# program with the log-probs / alphas streamed through double-buffered
# async copies (ops/pallas_ctc.py streaming kernels) — no per-frame grid
# dispatch at all (VERDICT r3 item 5).


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _ctc_loss_fb_pallas_stream(logits, labels, input_lens, label_lens,
                               blank_id):
    out, _ = _ctc_fb_pallas_stream_fwd(
        logits, labels, input_lens, label_lens, blank_id
    )
    return out


def _ctc_fb_pallas_stream_fwd(logits, labels, input_lens, label_lens,
                              blank_id):
    from ..ops.pallas_ctc import ctc_alpha_forward_stream

    B, T, V = logits.shape
    L = labels.shape[1]
    lp = jax.nn.log_softmax(logits, axis=-1)
    ext, allow_skip, state_valid = _lattice(labels, label_lens, blank_id, B, L)
    lp_tm = jnp.transpose(lp, (1, 0, 2)).astype(jnp.float32)
    ll, alphas = ctc_alpha_forward_stream(
        lp_tm, ext, allow_skip, state_valid, input_lens, label_lens
    )
    res = (lp, alphas, ll, ext, allow_skip, state_valid,
           input_lens, label_lens)
    return -ll, res


def _ctc_fb_pallas_stream_bwd(blank_id, res, g):
    from ..ops.pallas_ctc import ctc_beta_occupancy_stream

    (lp, alphas, ll, ext, allow_skip, state_valid,
     input_lens, label_lens) = res
    B, T, V = lp.shape
    lp_tm = jnp.transpose(lp, (1, 0, 2)).astype(jnp.float32)
    occ = ctc_beta_occupancy_stream(
        lp_tm, alphas, ext, allow_skip, state_valid,
        input_lens, label_lens, ll,
    )  # [T, B, V]
    occ = jnp.transpose(occ, (1, 0, 2))
    y = jnp.exp(lp)
    valid_t = (jnp.arange(T)[None, :] < input_lens[:, None])[:, :, None]
    grad = jnp.where(valid_t, y - occ, 0.0) * g[:, None, None]
    return grad.astype(lp.dtype), None, None, None


_ctc_loss_fb_pallas_stream.defvjp(
    _ctc_fb_pallas_stream_fwd, _ctc_fb_pallas_stream_bwd
)


def checked_ctc_loss(
    logits, labels, input_lens, label_lens, blank_id: int = 0
):
    """Debug-mode CTC loss with checkify length-bound assertions
    (SURVEY.md §6 "race detection / sanitizers" equivalent: there are no
    threads to race, so the failure mode worth instrumenting is malformed
    lengths/ids silently producing ~1e30 losses).

    Returns (err, loss_per_utt); call err.throw() on host to surface
    violations.  Usage:
        err, loss = jax.jit(checked_ctc_loss)(logits, labels, il, ll)
        err.throw()
    """
    from jax.experimental import checkify

    def body(logits, labels, input_lens, label_lens):
        B, T, V = logits.shape
        L = labels.shape[1]
        checkify.check(
            jnp.all((input_lens >= 0) & (input_lens <= T)),
            "input_lens out of [0, T]",
        )
        checkify.check(
            jnp.all((label_lens >= 0) & (label_lens <= L)),
            "label_lens out of [0, L]",
        )
        checkify.check(
            jnp.all((labels >= 0) & (labels < V)),
            "label ids out of vocab range",
        )
        checkify.check(
            jnp.all(jnp.isfinite(logits)), "non-finite logits into CTC"
        )
        return ctc_loss(logits, labels, input_lens, label_lens, blank_id)

    return checkify.checkify(body)(logits, labels, input_lens, label_lens)


def ctc_loss_mean(
    logits, labels, input_lens, label_lens, blank_id: int = 0
) -> jnp.ndarray:
    """Batch-mean CTC loss (the training objective; TF sums — we mean for
    batch-size-independent learning rates, noted in configs)."""
    per_utt = ctc_loss(logits, labels, input_lens, label_lens, blank_id)
    # Guard degenerate rows (T < L) whose loss is ~1e30: clip contribution.
    per_utt = jnp.where(per_utt > 1e29, 0.0, per_utt)
    return per_utt.mean()

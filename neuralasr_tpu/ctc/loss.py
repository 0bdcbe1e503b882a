"""CTC loss as a length-masked log-space scan (the BASELINE.json north-star
kernel).

TPU-first design, not a port of TF's `ctc_loss_calculator.h` (SURVEY.md §3
item 1):

- Fixed shapes: labels padded to Lmax, the expanded-state lattice is a fixed
  [B, S=2*Lmax+1] tensor; all batching is dense (no SparseTensor — that is a
  TF-1.x artifact).
- One `lax.scan` over time computes the alpha recursion for the whole batch
  on the VPU; emissions are pre-gathered into [T, B, S] so the scan body is
  pure elementwise math (shift + logsumexp3 + add).
- Length masking: frames past `input_lens` carry alpha through unchanged;
  states past each row's true 2L+1 never influence the final gather.
- Gradient: reverse-mode autodiff of the forward scan (mathematically the
  alpha-beta gradient; SURVEY.md §8 recommends exactly this).  Residual
  memory is O(T*B*S); `jax.checkpoint` can be applied by callers for very
  long T.

Blank id = 0 (package convention, neuralasr_tpu/text.py).
"""

from __future__ import annotations

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
    S = 2 * L + 1

    ext = expand_labels(labels.astype(jnp.int32), blank_id)  # [B, S]

    # Skip transition allowed into state s iff ext[s] is a non-blank label
    # differing from ext[s-2] (standard CTC; repeated labels must pass
    # through the separating blank).
    ext_m2 = jnp.concatenate(
        [jnp.full((B, 2), -1, dtype=ext.dtype), ext[:, :-2]], axis=1
    )
    allow_skip = (ext != blank_id) & (ext != ext_m2)  # [B, S]
    allow_skip = allow_skip.at[:, :2].set(False)

    # Pre-gather emissions for every lattice state: [B, T, S] -> [T, B, S].
    em = jnp.take_along_axis(
        log_probs, ext[:, None, :].astype(jnp.int32), axis=2
    )
    em = jnp.transpose(em, (1, 0, 2))

    s_idx = jnp.arange(S)[None, :]  # [1, S]
    # States beyond each row's true lattice (s >= 2*label_len+1) are dead.
    state_valid = s_idx < (2 * label_lens[:, None] + 1)  # [B, S]

    alpha0 = jnp.full((B, S), NEG_INF)
    alpha0 = alpha0.at[:, 0].set(em[0, :, 0])
    has_label = label_lens > 0
    alpha0 = alpha0.at[:, 1].set(jnp.where(has_label, em[0, :, 1], NEG_INF))
    alpha0 = jnp.where(state_valid, alpha0, NEG_INF)
    # Rows with input_len == 0 contribute nothing meaningful; t=0 is always
    # applied here, so clamp below via the final gather on input_lens >= 1.

    neg_col = jnp.full((B, 1), NEG_INF)

    def step(alpha, xs):
        em_t, t = xs
        a1 = jnp.concatenate([neg_col, alpha[:, :-1]], axis=1)
        a2 = jnp.concatenate([neg_col, neg_col, alpha[:, :-2]], axis=1)
        a2 = jnp.where(allow_skip, a2, NEG_INF)
        new = _logsumexp3(alpha, a1, a2) + em_t
        new = jnp.where(state_valid, new, NEG_INF)
        active = (t < input_lens)[:, None]  # [B, 1]
        return jnp.where(active, new, alpha), None

    ts = jnp.arange(1, T)
    alpha_T, _ = jax.lax.scan(step, alpha0, (em[1:], ts))

    # Final states: s = 2*label_len (trailing blank) and 2*label_len - 1
    # (last label).  Gather per row.
    last = (2 * label_lens).astype(jnp.int32)
    a_last = jnp.take_along_axis(alpha_T, last[:, None], axis=1)[:, 0]
    prev = jnp.clip(last - 1, 0, S - 1)
    a_prev = jnp.take_along_axis(alpha_T, prev[:, None], axis=1)[:, 0]
    a_prev = jnp.where(has_label, a_prev, NEG_INF)
    m = jnp.maximum(a_last, a_prev)
    ll = m + jnp.log(jnp.exp(a_last - m) + jnp.exp(a_prev - m))
    return ll


def ctc_loss(
    logits: jnp.ndarray,  # [B, T, V] raw logits
    labels: jnp.ndarray,  # [B, L]
    input_lens: jnp.ndarray,  # [B]
    label_lens: jnp.ndarray,  # [B]
    blank_id: int = 0,
    log_probs_in: bool = False,
) -> jnp.ndarray:
    """Per-utterance CTC negative log-likelihood, shape [B].

    Matches neuralasr_tpu/reference/ctc_oracle.py (and tf.nn.ctc_loss up to
    the blank-id convention) allclose — tests/test_ctc_loss.py.
    """
    lp = logits if log_probs_in else jax.nn.log_softmax(logits, axis=-1)
    ll = ctc_forward(lp, labels, input_lens, label_lens, blank_id)
    return -ll


def ctc_loss_mean(
    logits, labels, input_lens, label_lens, blank_id: int = 0
) -> jnp.ndarray:
    """Batch-mean CTC loss (the training objective; TF sums — we mean for
    batch-size-independent learning rates, noted in configs)."""
    per_utt = ctc_loss(logits, labels, input_lens, label_lens, blank_id)
    # Guard degenerate rows (T < L) whose loss is ~1e30: clip contribution.
    per_utt = jnp.where(per_utt > 1e29, 0.0, per_utt)
    return per_utt.mean()

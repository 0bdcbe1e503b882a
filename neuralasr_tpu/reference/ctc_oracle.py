"""Pure-numpy CTC forward-backward oracle.

Transparent re-derivation of the CTC loss (Graves et al. 2006) as the
reference's TF-1.x `tf.nn.ctc_loss` C++ kernel computes it (SURVEY.md §4.4):
expand the label sequence with interleaved blanks to 2L+1 states, run the
alpha (forward) recursion in log space over time, and return
loss = -logsumexp(alpha_T over the last two states).

Blank id follows this package's convention (0); tests re-map when comparing
against TF's blank=last convention.

Everything here is float64 numpy, written for clarity not speed — it is the
allclose ground truth for neuralasr_tpu/ctc/loss.py.
"""

from __future__ import annotations

import numpy as np

NEG_INF = -1e30


def _logsumexp2(a: float, b: float) -> float:
    m = max(a, b)
    if m <= NEG_INF / 2:
        return NEG_INF
    return m + np.log(np.exp(a - m) + np.exp(b - m))


def _logsumexp3(a: float, b: float, c: float) -> float:
    return _logsumexp2(_logsumexp2(a, b), c)


def log_softmax(logits: np.ndarray) -> np.ndarray:
    """Row-wise log-softmax over the last axis (per-frame log-posteriors)."""
    x = logits - logits.max(axis=-1, keepdims=True)
    return x - np.log(np.exp(x).sum(axis=-1, keepdims=True))


def expand_labels(labels: np.ndarray, blank_id: int = 0) -> np.ndarray:
    """[l1..lL] -> [blank, l1, blank, l2, ..., lL, blank] (2L+1 states)."""
    L = len(labels)
    out = np.full(2 * L + 1, blank_id, dtype=np.int64)
    out[1::2] = labels
    return out


def ctc_loss_single(
    logits: np.ndarray,  # [T, V] raw logits for one utterance
    labels: np.ndarray,  # [L] label ids, no blanks
    input_len: int,
    blank_id: int = 0,
) -> tuple[float, np.ndarray]:
    """CTC negative log-likelihood and the full alpha lattice.

    Returns (loss, alpha[T, 2L+1] in log space). loss = -log p(labels|logits).
    Edge case L=0: probability of emitting all blanks.
    """
    T = int(input_len)
    labels = np.asarray(labels, dtype=np.int64)
    L = len(labels)
    S = 2 * L + 1
    lp = log_softmax(np.asarray(logits[:T], dtype=np.float64))
    ext = expand_labels(labels, blank_id)

    if T < L:  # not enough frames to emit the labels
        return float(-NEG_INF), np.full((T, S), NEG_INF)

    alpha = np.full((T, S), NEG_INF)
    alpha[0, 0] = lp[0, ext[0]]
    if S > 1:
        alpha[0, 1] = lp[0, ext[1]]

    for t in range(1, T):
        for s in range(S):
            a = alpha[t - 1, s]
            b = alpha[t - 1, s - 1] if s - 1 >= 0 else NEG_INF
            # Skip connection: allowed when ext[s] is a label and differs from
            # the label two states back (no repeated-label shortcut).
            if s - 2 >= 0 and ext[s] != blank_id and ext[s] != ext[s - 2]:
                c = alpha[t - 1, s - 2]
            else:
                c = NEG_INF
            alpha[t, s] = _logsumexp3(a, b, c) + lp[t, ext[s]]

    if S > 1:
        ll = _logsumexp2(alpha[T - 1, S - 1], alpha[T - 1, S - 2])
    else:
        ll = alpha[T - 1, S - 1]
    return float(-ll), alpha


def ctc_loss_batch(
    logits: np.ndarray,  # [B, T, V]
    labels: np.ndarray,  # [B, Lmax] padded with anything past label_lens
    input_lens: np.ndarray,  # [B]
    label_lens: np.ndarray,  # [B]
    blank_id: int = 0,
) -> np.ndarray:
    """Per-utterance CTC losses. Shape [B]."""
    out = []
    for b in range(logits.shape[0]):
        loss, _ = ctc_loss_single(
            logits[b], labels[b, : int(label_lens[b])], int(input_lens[b]), blank_id
        )
        out.append(loss)
    return np.asarray(out)


def ctc_grad_single(
    logits: np.ndarray,
    labels: np.ndarray,
    input_len: int,
    blank_id: int = 0,
    eps: float = 1e-5,
) -> np.ndarray:
    """Numerical gradient d(loss)/d(logits) by central differences.

    O(T*V) loss evaluations — only for tiny test shapes.
    """
    T = int(input_len)
    g = np.zeros_like(logits, dtype=np.float64)
    for t in range(T):
        for v in range(logits.shape[1]):
            lp = logits.astype(np.float64).copy()
            lp[t, v] += eps
            lm = logits.astype(np.float64).copy()
            lm[t, v] -= eps
            fp, _ = ctc_loss_single(lp, labels, T, blank_id)
            fm, _ = ctc_loss_single(lm, labels, T, blank_id)
            g[t, v] = (fp - fm) / (2 * eps)
    return g


def greedy_decode_single(
    logits: np.ndarray, input_len: int, blank_id: int = 0
) -> list[int]:
    """Best-path decode: per-frame argmax, collapse repeats, drop blanks."""
    path = np.argmax(logits[: int(input_len)], axis=-1)
    out: list[int] = []
    prev = -1
    for p in path:
        p = int(p)
        if p != prev and p != blank_id:
            out.append(p)
        prev = p
    return out

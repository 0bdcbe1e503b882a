"""WER / CER metrics (host-side; SURVEY.md §3 item 5 — edit distance is a
metric, not on the training path).

Uses the native C++ batch edit-distance extension (native/) when built,
falling back to a numpy Levenshtein — results are identical; the extension
exists because the reference's edit distance is a TF C++ kernel and large
eval sets benefit from the ~50x native speedup.
"""

from __future__ import annotations

import numpy as np

try:
    from ..native import edit_distance_batch as _native_edb  # built lazily
except Exception:  # pragma: no cover - extension optional
    _native_edb = None


def edit_distance(ref: list, hyp: list) -> int:
    """Levenshtein distance between two token sequences (numpy DP)."""
    m, n = len(ref), len(hyp)
    if m == 0:
        return n
    if n == 0:
        return m
    prev = np.arange(n + 1, dtype=np.int64)
    for i in range(1, m + 1):
        cur = np.empty(n + 1, dtype=np.int64)
        cur[0] = i
        sub = prev[:-1] + (np.asarray(hyp) != ref[i - 1])
        for j in range(1, n + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, sub[j - 1])
        prev = cur
    return int(prev[n])


def _pair_distance(ref_tokens: list, hyp_tokens: list) -> int:
    if _native_edb is not None:
        return _native_edb([ref_tokens], [hyp_tokens])[0]
    return edit_distance(ref_tokens, hyp_tokens)


def wer(refs: list[str], hyps: list[str]) -> float:
    """Word error rate over a corpus: sum(dist) / sum(ref words)."""
    total_err, total_words = 0, 0
    pairs = [(r.split(), h.split()) for r, h in zip(refs, hyps, strict=True)]
    if _native_edb is not None:
        dists = _native_edb([p[0] for p in pairs], [p[1] for p in pairs])
        total_err = int(sum(dists))
    else:
        total_err = sum(edit_distance(r, h) for r, h in pairs)
    total_words = sum(len(r) for r, _ in pairs)
    return total_err / max(total_words, 1)


def cer(refs: list[str], hyps: list[str]) -> float:
    """Character error rate over a corpus."""
    pairs = [(list(r), list(h)) for r, h in zip(refs, hyps, strict=True)]
    if _native_edb is not None:
        dists = _native_edb([p[0] for p in pairs], [p[1] for p in pairs])
        err = int(sum(dists))
    else:
        err = sum(edit_distance(r, h) for r, h in pairs)
    chars = sum(len(r) for r, _ in pairs)
    return err / max(chars, 1)


def per_utt_word_errors(refs: list[str], hyps: list[str]):
    """Per-utterance (word edit distance, ref word count) arrays."""
    pairs = [(r.split(), h.split()) for r, h in zip(refs, hyps, strict=True)]
    if _native_edb is not None:
        dists = np.asarray(
            _native_edb([p[0] for p in pairs], [p[1] for p in pairs]),
            dtype=np.int64,
        )
    else:
        dists = np.asarray(
            [edit_distance(r, h) for r, h in pairs], dtype=np.int64
        )
    words = np.asarray([len(r) for r, _ in pairs], dtype=np.int64)
    return dists, words


def wer_bootstrap_ci(
    refs: list[str],
    hyps: list[str],
    n_boot: int = 2000,
    seed: int = 0,
    alpha: float = 0.05,
) -> tuple[float, float]:
    """Nonparametric bootstrap 95% (by default) CI of the corpus WER over
    utterances (SURVEY.md §5.5 / VERDICT r3 item 4: gates need a measured
    protocol-noise scale, not hand-picked margins).  Resamples utterances
    with replacement; WER of each resample = sum(edits)/sum(words)."""
    dists, words = per_utt_word_errors(refs, hyps)
    n = len(dists)
    if n == 0:
        return (0.0, 0.0)
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, n, size=(n_boot, n))
    wers = dists[idx].sum(axis=1) / np.maximum(words[idx].sum(axis=1), 1)
    lo, hi = np.percentile(wers, [100 * alpha / 2, 100 * (1 - alpha / 2)])
    return (float(lo), float(hi))

"""Host-python CTC prefix beam search oracle.

Transparent re-derivation of the reference's `ctc_beam_search.h` C++ prefix
beam search (SURVEY.md §4.5): per prefix keep p_blank ("paths ending in
blank") and p_non_blank ("paths ending in the prefix's last char"), expand by
every vocab symbol per frame, prune to the top-W prefixes by total
probability.  Supports optional shallow-fusion scoring (config 4) via an
`lm_score(prefix_ids, next_id) -> logp` callback.

This is the disagreement-triage oracle for neuralasr_tpu/ctc/beam.py.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

from .ctc_oracle import log_softmax

NEG_INF = -1e30


def _lse(a: float, b: float) -> float:
    m = max(a, b)
    if m <= NEG_INF / 2:
        return NEG_INF
    return m + np.log(np.exp(a - m) + np.exp(b - m))


def beam_search_single(
    logits: np.ndarray,  # [T, V] raw logits
    input_len: int,
    beam_width: int = 16,
    blank_id: int = 0,
    lm_score: Optional[Callable[[tuple, int], float]] = None,
    lm_weight: float = 0.0,
    prune_logp: float = -20.0,
) -> list[tuple[list[int], float]]:
    """Returns the top beams as (label_ids, total_log_prob), best first.

    `prune_logp`: per-frame symbols with log-posterior below
    (frame max + prune_logp) are skipped — set to -1e9 to disable (the
    on-device kernel expands all symbols; tests disable pruning for parity).
    """
    T = int(input_len)
    lp = log_softmax(np.asarray(logits[:T], dtype=np.float64))

    # beams: prefix tuple -> [p_blank, p_non_blank] (log space)
    beams: dict[tuple, list[float]] = {(): [0.0, NEG_INF]}

    for t in range(T):
        frame = lp[t]
        cutoff = frame.max() + prune_logp
        new_beams: dict[tuple, list[float]] = {}

        def get(p):
            if p not in new_beams:
                new_beams[p] = [NEG_INF, NEG_INF]
            return new_beams[p]

        for prefix, (pb, pnb) in beams.items():
            total = _lse(pb, pnb)
            # Case 1: emit blank -> prefix unchanged, ends in blank.
            nb = get(prefix)
            nb[0] = _lse(nb[0], total + frame[blank_id])
            # Case 2: repeat last char -> prefix unchanged, only extends
            # paths already ending in that char (no new label emitted).
            if prefix:
                last = prefix[-1]
                if frame[last] >= cutoff:
                    nb[1] = _lse(nb[1], pnb + frame[last])
            # Case 3: extend with char c != blank.
            for c in range(len(frame)):
                if c == blank_id or frame[c] < cutoff:
                    continue
                ext = prefix + (c,)
                lm = lm_weight * lm_score(prefix, c) if lm_score else 0.0
                eb = get(ext)
                if prefix and c == prefix[-1]:
                    # Extending with the same char requires a blank in
                    # between: only paths ending in blank contribute.
                    eb[1] = _lse(eb[1], pb + frame[c] + lm)
                else:
                    eb[1] = _lse(eb[1], total + frame[c] + lm)

        scored = sorted(
            new_beams.items(), key=lambda kv: -_lse(kv[1][0], kv[1][1])
        )
        beams = dict(scored[:beam_width])

    out = [
        (list(p), _lse(pb, pnb)) for p, (pb, pnb) in beams.items()
    ]
    out.sort(key=lambda kv: -kv[1])
    return out

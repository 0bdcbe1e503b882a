"""Bucketed-by-length batching with jit-stable shapes (SURVEY.md §8).

Every bucket has a FIXED (max_samples, max_label_len, batch_size) triple;
all batches from a bucket share one XLA program.  Bucket edges default to a
~1.45x geometric ladder in audio seconds; label caps scale with duration.
An utterance goes to the smallest bucket that fits both its samples and its
label length; utterances longer than the last bucket are dropped (counted,
never silent — loader reports drops).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class BucketSpec:
    """One bucket: fixed padded shapes and batch size."""

    max_samples: int
    max_label_len: int
    batch_size: int


def default_buckets(
    batch_size: int,
    sample_rate: int = 16000,
    edges_seconds: tuple = (2.0, 3.0, 4.5, 6.5, 9.5, 14.0, 20.0, 30.0),
    chars_per_second: float = 16.0,
) -> list[BucketSpec]:
    """Geometric duration ladder; batch size halves every two buckets so the
    per-batch compute (B*T) stays roughly constant across buckets."""
    out = []
    for i, sec in enumerate(edges_seconds):
        bs = max(1, batch_size >> (i // 2))
        out.append(
            BucketSpec(
                max_samples=int(sec * sample_rate),
                max_label_len=int(sec * chars_per_second),
                batch_size=bs,
            )
        )
    return out


def bucket_for(
    buckets: list[BucketSpec], num_samples: int, label_len: int
) -> int | None:
    """Smallest bucket fitting both dims; None if the utterance is too long."""
    for i, b in enumerate(buckets):
        if num_samples <= b.max_samples and label_len <= b.max_label_len:
            return i
    return None

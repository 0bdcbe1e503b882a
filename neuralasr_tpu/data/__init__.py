"""Data pipeline: corpora, bucketed batching, multi-host loaders.

The reference reads LibriSpeech flac + .trans.txt on host and feeds padded
batches (SURVEY.md §2 L1/L3).  This environment has no network and no audio
corpus on disk, so the primary corpus is a deterministic synthetic
speech-like generator (data/synthetic.py) with the LibriSpeech directory
layout reader alongside (data/librispeech.py) for real deployments.

Batching is bucketed-by-length with FIXED per-bucket shapes — every batch of
a bucket compiles exactly one XLA program (recompile guard:
tests/test_recompile.py).  Multi-host: batches are formed globally and
deterministically, each process materializes its own row-slice, so the
global batch composition is independent of host count (SURVEY.md §8 hard
parts).
"""

from .synthetic import SyntheticCorpus
from .buckets import BucketSpec, bucket_for
from .loader import BucketedLoader, Batch

__all__ = [
    "SyntheticCorpus",
    "BucketSpec",
    "bucket_for",
    "BucketedLoader",
    "Batch",
]

"""Recompilation guard (SURVEY.md §5.4): one XLA program per bucket shape.

Bucketing bugs show up as silent per-batch recompiles (100x slowdowns on
TPU); assert the jit cache stays at one entry per bucket across batches.
"""

import dataclasses

from neuralasr_tpu.configs import CONFIG1
from neuralasr_tpu.training import Trainer


def _cache_size(jitted) -> int:
    return jitted._cache_size()


def test_one_program_per_bucket():
    cfg = dataclasses.replace(
        CONFIG1,
        num_utterances=24,
        batch_size=8,
        model=dataclasses.replace(CONFIG1.model, num_layers=1, hidden=64),
    )
    tr = Trainer(cfg)
    seen_buckets = set()
    for epoch in range(2):
        for batch in tr.loader.epoch(epoch):
            tr.train_batch(batch)
            seen_buckets.add(batch.bucket)
    assert len(seen_buckets) >= 2, "toy corpus should span >= 2 buckets"
    for bucket, fn in tr._step_fns.items():
        assert _cache_size(fn) == 1, (
            f"bucket {bucket} recompiled: cache={_cache_size(fn)}"
        )

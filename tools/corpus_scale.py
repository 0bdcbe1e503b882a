"""960h-shaped data-path exercise (VERDICT r2 item 6).

Builds (once) a >=100k-utterance int16 packed synthetic corpus, then
measures the loader path at that scale:

  - pack time (first run only) and on-disk size
  - PackedCorpus open + BucketedLoader init time (vectorized bucketing
    reads only shard length metadata)
  - steady-state host materialize throughput (audio-s/s of Batch assembly,
    no device in the loop)
  - peak RSS across the run (mmap-backed shards must not pull the corpus
    into RAM)
  - optionally (--train-steps N) real train steps through the corpus

Prints one JSON line; append it to BASELINE.md's corpus-scale row.

    python tools/corpus_scale.py --utts 100000 [--train-steps 200 --cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import time


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def rss_split_gb() -> dict:
    """(anon, file) resident GB.  Anon = process-owned RAM; file = clean
    page-cache pages of the mmap'd shards, evictable under pressure — the
    number that must stay FLAT for 'a 960h corpus never has to fit in RAM'
    to hold is anon."""
    out = {}
    with open("/proc/self/status") as f:
        for line in f:
            key = line.split(":")[0]
            if key in ("RssAnon", "RssFile"):
                out[key] = round(int(line.split()[1]) / 1e6, 3)
    return {"rss_anon_gb": out.get("RssAnon"), "rss_file_gb": out.get("RssFile")}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--utts", type=int, default=100_000)
    p.add_argument("--dir", default="runs/corpus_100k")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--batches", type=int, default=200,
                   help="batches to materialize for the host-throughput row")
    p.add_argument("--train-steps", type=int, default=0,
                   help="also run N conformer train steps through it")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from neuralasr_tpu.data import BucketedLoader, SyntheticCorpus
    from neuralasr_tpu.data.buckets import default_buckets
    from neuralasr_tpu.data.prepare import PackedCorpus, write_shards

    out = {"metric": "corpus_scale", "utts": args.utts}

    manifest = os.path.join(args.dir, "manifest.json")
    if not os.path.exists(manifest):
        corpus = SyntheticCorpus(args.utts, seed=args.seed)
        t0 = time.time()
        write_shards(corpus, args.dir, shard_size=2048, dtype=np.int16)
        out["pack_wall_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    packed = PackedCorpus(args.dir)
    out["open_s"] = round(time.time() - t0, 3)
    assert len(packed) == args.utts, (len(packed), args.utts)
    size = sum(
        os.path.getsize(os.path.join(args.dir, f))
        for f in os.listdir(args.dir)
    )
    out["disk_gb"] = round(size / 1e9, 2)

    t0 = time.time()
    loader = BucketedLoader(packed, default_buckets(32), seed=0)
    out["loader_init_s"] = round(time.time() - t0, 3)
    out["audio_hours"] = round(
        sum(s["audio_samples"] for s in packed.manifest["shards"])
        / 16000 / 3600, 1,
    )

    # Host-side materialize throughput (the producer half of the prefetched
    # pipeline): audio-s assembled per wall-second.
    t0 = time.time()
    audio_s = 0.0
    n = 0
    for batch in loader.epoch(0):
        audio_s += float(batch.wav_lens.sum()) / 16000
        n += 1
        if n >= args.batches:
            break
    dt = time.time() - t0
    out["materialize_batches"] = n
    out["materialize_audio_s_per_s"] = round(audio_s / dt, 1)
    out["rss_gb"] = round(rss_gb(), 2)
    out.update(rss_split_gb())

    if args.train_steps:
        import dataclasses

        import jax

        from neuralasr_tpu.configs import CONFIG5
        from neuralasr_tpu.data.prefetch import DevicePrefetcher
        from neuralasr_tpu.training import Trainer
        from neuralasr_tpu.utils.compile_cache import enable_compilation_cache

        enable_compilation_cache()
        cfg = dataclasses.replace(
            CONFIG5, cache_dir="", num_utterances=args.utts, batch_size=32
        )
        trainer = Trainer(cfg)
        trainer.corpus = packed
        trainer.loader = loader
        # Pre-warm ONE step per distinct bucket first: every bucket shape
        # is its own XLA program, and axon REMOTE compiles bypass the
        # persistent cache — without this the timed window absorbs
        # minutes of compiles and reads as a ~100x slowdown (round-3
        # first run measured 94 audio-s/s that way).
        seen = set()
        for batch in loader.epoch(0):
            if batch.bucket in seen:
                continue
            seen.add(batch.bucket)
            trainer.train_batch_device(
                batch.bucket, trainer.put_batch(batch)
            )
        jax.block_until_ready(trainer.state["params"])
        t_warm, audio_s, steps = time.time(), 0.0, 0
        prefetch = DevicePrefetcher(loader.epoch(1), trainer.put_batch)
        try:
            for batch, dev_args in prefetch:
                trainer.train_batch_device(batch.bucket, dev_args)
                steps += 1
                audio_s += trainer.batch_audio_s(batch)
                if steps >= args.train_steps:
                    break
        finally:
            prefetch.close()
        jax.block_until_ready(trainer.state["params"])
        out["train_steps"] = steps
        out["train_wall_audio_s_per_s"] = round(
            audio_s / max(time.time() - t_warm, 1e-9), 1
        )
        out["rss_after_train_gb"] = round(rss_gb(), 2)
        out.update({f"train_{k}": v for k, v in rss_split_gb().items()})

    print(json.dumps(out))


if __name__ == "__main__":
    main()

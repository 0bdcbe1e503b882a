"""Bucketed, deterministic, multi-host-aware batch loader.

Design (SURVEY.md §6 distributed backend, §8 hard parts):
- Batches are composed GLOBALLY and deterministically from (seed, epoch):
  shuffle utterance ids, assign to buckets, emit fixed-size batches in a
  deterministic interleaved order. Every process computes the identical
  global plan; a process materializes audio only for its own row-slice
  (rows r with r % process_count == process_index), so the global batch
  composition is independent of host count — DP gradients match the
  single-host run exactly (tests/test_distributed.py).
- Iterator state is just (epoch, batch_index): checkpoint/resume stores
  these two ints and skips ahead without replaying audio (SURVEY.md §6
  checkpoint/resume).
- Short batches at bucket tails are padded with repeated rows and a
  `weights` mask so the loss ignores duplicates but shapes stay fixed.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..text import encode
from .buckets import BucketSpec, bucket_for


@dataclasses.dataclass
class Batch:
    wav: np.ndarray  # [B, max_samples] int16 PCM (or float32; the frontend
    # upcasts on device — int16 is the wire format, halving H2D bytes)
    wav_lens: np.ndarray  # [B] int32
    labels: np.ndarray  # [B, max_label_len] int32 (blank=0 padded)
    label_lens: np.ndarray  # [B] int32
    weights: np.ndarray  # [B] float32; 0 for tail-padding duplicate rows
    bucket: int
    epoch: int
    index: int  # batch index within the epoch's global plan


class BucketedLoader:
    def __init__(
        self,
        corpus,
        buckets: list[BucketSpec],
        seed: int = 0,
        process_index: int = 0,
        process_count: int = 1,
        drop_too_long: bool = True,
    ):
        self.corpus = corpus
        self.buckets = buckets
        self.seed = seed
        self.process_index = process_index
        self.process_count = process_count

        # Bucket every utterance up front.  Corpora exposing bulk length
        # metadata (PackedCorpus.lengths — read straight from shard meta,
        # VERDICT r2 item 6) get a vectorized numpy assignment; others fall
        # back to the per-utterance loop.
        if hasattr(corpus, "lengths"):
            ns, ls = corpus.lengths()
            assigned = np.full(len(ns), -1, dtype=np.int64)
            for i, b in enumerate(buckets):
                fit = (
                    (assigned < 0)
                    & (ns <= b.max_samples)
                    & (ls <= b.max_label_len)
                )
                assigned[fit] = i
            self._assignment = [
                np.flatnonzero(assigned == i).tolist()
                for i in range(len(buckets))
            ]
            self.dropped = int((assigned < 0).sum())
            if self.dropped and not drop_too_long:
                raise ValueError(
                    f"{self.dropped} utterances fit no bucket"
                )
        else:
            self._assignment = [[] for _ in buckets]
            self.dropped = 0
            for i in range(len(corpus)):
                n = corpus.num_samples(i)
                L = len(encode(corpus.transcript(i)))
                b = bucket_for(buckets, n, L)
                if b is None:
                    self.dropped += 1
                    if not drop_too_long:
                        raise ValueError(f"utterance {i} fits no bucket")
                else:
                    self._assignment[b].append(i)
        if self.dropped:
            print(
                f"[loader] dropped {self.dropped}/{len(corpus)} utterances "
                "longer than the last bucket"
            )

    def plan(self, epoch: int) -> list[tuple[int, list[int]]]:
        """Deterministic global plan: list of (bucket_idx, utterance_ids).
        Tail batches are padded by repeating their first ids (weights=0)."""
        rng = np.random.default_rng((self.seed, epoch))
        batches: list[tuple[int, list[int]]] = []
        for b_idx, ids in enumerate(self._assignment):
            if not ids:
                continue
            perm = [ids[j] for j in rng.permutation(len(ids))]
            bs = self.buckets[b_idx].batch_size
            for k in range(0, len(perm), bs):
                batches.append((b_idx, perm[k : k + bs]))
        order = rng.permutation(len(batches))
        return [batches[j] for j in order]

    def num_batches(self, epoch: int = 0) -> int:
        return len(self.plan(epoch))

    def epoch(self, epoch: int, start_batch: int = 0):
        """Yields Batch for this process's row-slice of each global batch."""
        plan = self.plan(epoch)
        for idx in range(start_batch, len(plan)):
            b_idx, ids = plan[idx]
            yield self.materialize(b_idx, ids, epoch, idx)

    def materialize(
        self, b_idx: int, ids: list[int], epoch: int, index: int
    ) -> Batch:
        spec = self.buckets[b_idx]
        bs = spec.batch_size
        # Tail padding: repeat ids cyclically, weight 0.
        full = list(ids) + [ids[j % len(ids)] for j in range(bs - len(ids))]
        weights = np.array(
            [1.0] * len(ids) + [0.0] * (bs - len(ids)), dtype=np.float32
        )
        # int16 PCM wire format: audio is natively 16-bit; shipping int16
        # instead of float32 halves host->device bytes (H2D is the pipeline
        # bottleneck), and the frontend upcasts on device. Rounding is
        # lossless for PCM-sourced corpora.
        wav = np.zeros((bs, spec.max_samples), dtype=np.int16)
        wav_lens = np.zeros((bs,), dtype=np.int32)
        labels = np.zeros((bs, spec.max_label_len), dtype=np.int32)
        label_lens = np.zeros((bs,), dtype=np.int32)
        # Multi-host: process p owns the contiguous row block
        # [p*bs/P, (p+1)*bs/P) — matching NamedSharding(P('data')) shards so
        # train code can hand the block to make_array_from_process_local_data.
        if bs % self.process_count != 0:
            raise ValueError(
                f"bucket batch size {bs} not divisible by "
                f"process_count {self.process_count}"
            )
        rows_per_proc = bs // self.process_count
        lo = self.process_index * rows_per_proc
        hi = lo + rows_per_proc
        for r, utt in enumerate(full):
            if not (lo <= r < hi):
                continue
            w, tr = self.corpus[utt]
            n = min(len(w), spec.max_samples)
            wav[r, :n] = np.clip(np.rint(w[:n]), -32768, 32767).astype(
                np.int16
            )
            wav_lens[r] = n
            lab = encode(tr)[: spec.max_label_len]
            labels[r, : len(lab)] = lab
            label_lens[r] = len(lab)
        return Batch(wav, wav_lens, labels, label_lens, weights, b_idx, epoch, index)

    def local_rows(self, batch: Batch) -> slice:
        """This process's contiguous row block within the global batch."""
        bs = self.buckets[batch.bucket].batch_size
        rows = bs // self.process_count
        return slice(self.process_index * rows, (self.process_index + 1) * rows)

"""Offline prep shards round-trip through the corpus protocol."""

import numpy as np

from neuralasr_tpu.data.synthetic import SyntheticCorpus
from neuralasr_tpu.data.prepare import write_shards, PackedCorpus
from neuralasr_tpu.data import BucketedLoader
from neuralasr_tpu.data.buckets import default_buckets


def test_pack_roundtrip(tmp_path):
    corpus = SyntheticCorpus(10, seed=4)
    write_shards(corpus, str(tmp_path), shard_size=4)  # 3 shards
    packed = PackedCorpus(str(tmp_path))
    assert len(packed) == 10
    for i in (0, 3, 4, 9):
        assert packed.transcript(i) == corpus.transcript(i)
        np.testing.assert_array_equal(packed.waveform(i), corpus.waveform(i))
        assert packed.num_samples(i) == len(corpus.waveform(i))


def test_packed_corpus_feeds_loader(tmp_path):
    corpus = SyntheticCorpus(12, seed=4)
    write_shards(corpus, str(tmp_path), shard_size=8)
    packed = PackedCorpus(str(tmp_path))
    direct = BucketedLoader(corpus, default_buckets(4), seed=1)
    via_pack = BucketedLoader(packed, default_buckets(4), seed=1)
    a = next(iter(direct.epoch(0)))
    b = next(iter(via_pack.epoch(0)))
    np.testing.assert_array_equal(a.wav, b.wav)
    np.testing.assert_array_equal(a.labels, b.labels)


def test_lengths_metadata_and_vectorized_bucketing(tmp_path):
    """PackedCorpus.lengths() (shard-meta arrays, no audio/transcript touch)
    must match per-utterance queries, and the loader's vectorized bucket
    assignment must equal the sequential per-utterance path exactly."""
    from neuralasr_tpu.data import BucketedLoader, SyntheticCorpus
    from neuralasr_tpu.data.buckets import default_buckets
    from neuralasr_tpu.data.prepare import PackedCorpus, write_shards
    from neuralasr_tpu.text import encode

    corpus = SyntheticCorpus(40, seed=9)
    write_shards(corpus, str(tmp_path / "p"), shard_size=16, dtype=np.int16)
    packed = PackedCorpus(str(tmp_path / "p"))
    ns, ls = packed.lengths()
    assert len(ns) == len(ls) == 40
    for i in (0, 7, 39):
        assert int(ns[i]) == packed.num_samples(i)
        assert int(ls[i]) == len(encode(packed.transcript(i)))

    class NoLengths:  # same corpus, lengths() hidden -> sequential path
        def __init__(self, c):
            self._c = c

        def __len__(self):
            return len(self._c)

        def num_samples(self, i):
            return self._c.num_samples(i)

        def transcript(self, i):
            return self._c.transcript(i)

        def __getitem__(self, i):
            return self._c[i]

    buckets = default_buckets(4)
    fast = BucketedLoader(packed, buckets, seed=1)
    slow = BucketedLoader(NoLengths(packed), buckets, seed=1)
    assert fast._assignment == slow._assignment
    assert fast.dropped == slow.dropped
    assert fast.plan(0) == slow.plan(0)

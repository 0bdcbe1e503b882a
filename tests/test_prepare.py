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

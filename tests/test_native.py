"""Native extension parity: C++ edit distance vs numpy; WAV decode."""

import io
import struct
import wave

import numpy as np
import pytest

native = pytest.importorskip("neuralasr_tpu.native")

from neuralasr_tpu.utils.metrics import edit_distance, wer


def test_edit_distance_matches_numpy():
    rng = np.random.default_rng(0)
    refs, hyps = [], []
    for _ in range(50):
        la, lb = rng.integers(0, 20, size=2)
        refs.append(list(rng.integers(0, 5, size=la)))
        hyps.append(list(rng.integers(0, 5, size=lb)))
    got = native.edit_distance_batch(refs, hyps)
    want = [edit_distance(r, h) for r, h in zip(refs, hyps)]
    assert list(got) == want


def test_edit_distance_words():
    got = native.edit_distance_batch(
        [["the", "cat", "sat"], []], [["the", "bat", "sat", "down"], ["x"]]
    )
    assert list(got) == [2, 1]


def test_wer_uses_native_and_matches():
    refs = ["the cat sat", "hello world"]
    hyps = ["the bat sat down", "hello word"]
    # wer = (2 + 1) / (3 + 2)
    assert abs(wer(refs, hyps) - 3 / 5) < 1e-9


def test_wav_decode_roundtrip():
    rng = np.random.default_rng(1)
    pcm = (rng.normal(size=1000) * 3000).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())
    samples, rate = native.wav_decode(buf.getvalue())
    assert rate == 16000
    np.testing.assert_array_equal(samples, pcm.astype(np.float32))


def test_wav_decode_rejects_garbage():
    with pytest.raises(ValueError):
        native.wav_decode(b"not a wav file at all........................................")

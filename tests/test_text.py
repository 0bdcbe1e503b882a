"""Vocabulary pinning (parity-critical per SURVEY.md §2 L3)."""

from neuralasr_tpu import text


def test_vocab_pinned():
    assert text.VOCAB_SIZE == 29
    assert text.BLANK_ID == 0
    assert text.VOCAB[0] == "<blank>"
    assert "".join(text.VOCAB[1:]) == " 'abcdefghijklmnopqrstuvwxyz"


def test_normalize():
    assert text.normalize("Hello,  World!") == "hello world"
    assert text.normalize("DON'T stop") == "don't stop"
    assert text.normalize("  a  b  ") == "a b"


def test_roundtrip():
    s = "the quick brown fox's jump"
    assert text.decode(text.encode(s)) == s
    assert all(i != text.BLANK_ID for i in text.encode(s))

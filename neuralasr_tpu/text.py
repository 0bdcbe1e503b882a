"""Character vocabulary and transcript normalization.

Capability parity target: the reference's char map (lowercase a-z, space,
apostrophe, CTC blank; SURVEY.md §2 L3/L4 — reference file unverifiable,
mount empty).  The alphabet is parity-critical for WER comparison, so it is
pinned here and tested in tests/test_text.py.

Convention: blank id is 0 (modern convention; jnp.argmax ties break low, and
id 0 padding doubles as blank which simplifies masked decoding).  The TF
oracle tests re-map to TF's blank=last convention at the test boundary.
"""

from __future__ import annotations

import re

# Index 0 is reserved for the CTC blank. Characters are a-z, space, apostrophe.
BLANK_ID = 0
_CHARS = " 'abcdefghijklmnopqrstuvwxyz"
VOCAB = ["<blank>"] + list(_CHARS)
VOCAB_SIZE = len(VOCAB)  # 29

_CHAR_TO_ID = {c: i + 1 for i, c in enumerate(_CHARS)}
_ID_TO_CHAR = {i + 1: c for i, c in enumerate(_CHARS)}

_NORMALIZE_RE = re.compile(r"[^a-z' ]+")
_SPACE_RE = re.compile(r"\s+")


def normalize(transcript: str) -> str:
    """Lowercase, strip everything outside the alphabet, collapse whitespace."""
    t = transcript.lower()
    t = _NORMALIZE_RE.sub(" ", t)
    t = _SPACE_RE.sub(" ", t).strip()
    return t


def encode(transcript: str) -> list[int]:
    """Normalized transcript -> label ids (no blanks)."""
    return [_CHAR_TO_ID[c] for c in normalize(transcript)]


def decode(ids) -> str:
    """Label ids -> string. Ignores blanks/out-of-range defensively."""
    return "".join(_ID_TO_CHAR.get(int(i), "") for i in ids)

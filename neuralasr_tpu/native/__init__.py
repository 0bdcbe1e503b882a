"""ctypes bindings for the native host components (native/asr_native.cpp).

Loads native/libasrnative.so, building it with `make` on first use if a
toolchain exists.  Import raises ImportError when neither is possible;
callers (utils/metrics.py, data/librispeech.py) fall back to numpy paths —
identical results, just slower.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

# Sources ship as package data alongside this module, so the first-use
# `make` build works from site-packages as well as from a checkout.
_NATIVE_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_NATIVE_DIR, "libasrnative.so")


def _stale() -> bool:
    """True when the .so is missing or older than any source/Makefile.

    A committed prebuilt .so must never shadow a newer asr_native.cpp
    (ADVICE r2) — compare mtimes and rebuild on skew."""
    if not os.path.exists(_SO):
        return True
    so_mtime = os.path.getmtime(_SO)
    for name in os.listdir(_NATIVE_DIR):
        if name.endswith((".cpp", ".h")) or name == "Makefile":
            if os.path.getmtime(os.path.join(_NATIVE_DIR, name)) > so_mtime:
                return True
    return False


def _load() -> ctypes.CDLL:
    if _stale():
        subprocess.run(
            ["make", "-C", _NATIVE_DIR, "-sB"],
            check=True,
            capture_output=True,
        )
    lib = ctypes.CDLL(_SO)
    lib.edit_distance_batch.argtypes = [
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.edit_distance_batch.restype = None
    lib.wav_decode_pcm16.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.wav_decode_pcm16.restype = ctypes.c_int64
    lib.flac_decode.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.flac_decode.restype = ctypes.c_int64
    return lib


try:
    _lib = _load()
except Exception as e:  # pragma: no cover - toolchain-less environments
    raise ImportError(f"native library unavailable: {e}") from e


def edit_distance_batch(refs: list[list], hyps: list[list]) -> np.ndarray:
    """Levenshtein distances for n (ref, hyp) token-sequence pairs."""
    assert len(refs) == len(hyps)
    n = len(refs)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    # One shared interner so equal tokens get equal ids across refs/hyps.
    interner: dict = {}

    def enc(seqs):
        flat, off = [], [0]
        for s in seqs:
            for tok in s:
                flat.append(interner.setdefault(tok, len(interner)))
            off.append(len(flat))
        return (
            np.asarray(flat or [0], dtype=np.int32),
            np.asarray(off, dtype=np.int64),
        )

    rf, ro = enc(refs)
    hf, ho = enc(hyps)
    out = np.zeros(n, dtype=np.int64)
    _lib.edit_distance_batch(
        rf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ro.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        hf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ho.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 bytes -> (float32 samples of channel 0, sample_rate)."""
    buf = np.frombuffer(data, dtype=np.uint8)
    out = np.zeros(len(data) // 2 + 1, dtype=np.float32)
    rate = ctypes.c_int32(0)
    n = _lib.wav_decode_pcm16(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(out),
        ctypes.byref(rate),
    )
    if n < 0:
        raise ValueError("not a PCM16 RIFF/WAVE file")
    return out[:n], int(rate.value)


_FLAC_ERRORS = {
    -1: "bad magic or STREAMINFO",
    -2: "bitstream parse error",
    -3: "CRC mismatch",
    -4: "output buffer too small",
}


def flac_decode(data: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes -> (float32 samples of channel 0, sample_rate).

    C++ decoder (native/asr_native.cpp); same convention as wav_decode —
    raw integer amplitudes, first channel.  The pure-Python fallback with
    identical semantics lives in data/flac.py."""
    from ..data.flac import parse_streaminfo

    si = parse_streaminfo(data)  # raises ValueError on non-FLAC input
    # total_samples may legally be 0 (unknown); bound by the bitstream then:
    # even an all-escape 1-bit-raw stream yields < 8 samples per byte.
    cap = si["total_samples"] or len(data) * 8
    buf = np.frombuffer(data, dtype=np.uint8)
    out = np.zeros(cap + 1, dtype=np.float32)
    rate = ctypes.c_int32(0)
    n = _lib.flac_decode(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(out),
        ctypes.byref(rate),
    )
    if n < 0:
        raise ValueError(
            f"flac decode failed: {_FLAC_ERRORS.get(int(n), 'unknown error')}"
        )
    return out[:n], int(rate.value)

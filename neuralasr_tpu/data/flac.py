"""Pure-Python FLAC decoder (fallback for toolchain-less environments).

LibriSpeech ships .flac (the reference decodes it through libsndfile —
SURVEY.md §3 audio-codec row, §4.1 call stack); the primary decoder here is
the C++ `flac_decode` in native/asr_native.cpp, and this module is the
dependency-free fallback with identical semantics:

    flac_decode(data: bytes) -> (float32 samples of channel 0, sample_rate)

Covers the subset LibriSpeech-era libFLAC emits: constant / verbatim /
fixed(0-4) / LPC subframes, Rice residuals (both coding methods + escape
partitions), wasted bits, mono + stereo in all four channel layouts, 8-32
bit samples.  CRC-8 (frame header) and CRC-16 (whole frame) are verified so
bitstream desyncs raise instead of returning garbage.

Sample values keep their raw integer amplitude (matching wav_decode's
convention for PCM16: no 1/32768 scaling).
"""

from __future__ import annotations

import numpy as np

_FIXED_COEFS = {
    0: (),
    1: (1,),
    2: (2, -1),
    3: (3, -3, 1),
    4: (4, -6, 4, -1),
}


class _Bits:
    """MSB-first bit reader over bytes."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos  # byte position
        self.bit = 0  # bits consumed within data[pos]

    def read(self, k: int) -> int:
        v = 0
        while k > 0:
            if self.pos >= len(self.data):
                raise ValueError("flac: truncated stream")
            avail = 8 - self.bit
            take = min(avail, k)
            shift = avail - take
            v = (v << take) | ((self.data[self.pos] >> shift) & ((1 << take) - 1))
            self.bit += take
            k -= take
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v

    def sread(self, k: int) -> int:
        v = self.read(k)
        return v - (1 << k) if v >> (k - 1) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 24:
                raise ValueError("flac: runaway unary code")
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


def _crc8(data: bytes) -> int:
    c = 0
    for byte in data:
        c ^= byte
        for _ in range(8):
            c = ((c << 1) ^ 0x07 if c & 0x80 else c << 1) & 0xFF
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for byte in data:
        c ^= byte << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005 if c & 0x8000 else c << 1) & 0xFFFF
    return c


def parse_streaminfo(data: bytes) -> dict:
    """STREAMINFO fields from the head of a FLAC file (no audio decode).

    Used by the loader's bucketing pass: num_samples for every utterance
    without decoding any frame (data/librispeech.py)."""
    if len(data) < 42 or data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    while True:
        if pos + 4 > len(data):
            raise ValueError("flac: no STREAMINFO block")
        last = data[pos] & 0x80
        btype = data[pos] & 0x7F
        blen = int.from_bytes(data[pos + 1 : pos + 4], "big")
        pos += 4
        if btype == 0 and blen >= 34:
            b = data[pos : pos + 34]
            rate = (b[10] << 12) | (b[11] << 4) | (b[12] >> 4)
            return {
                "min_blocksize": int.from_bytes(b[0:2], "big"),
                "max_blocksize": int.from_bytes(b[2:4], "big"),
                "sample_rate": rate,
                "channels": ((b[12] >> 1) & 0x07) + 1,
                "bits_per_sample": (((b[12] & 1) << 4) | (b[13] >> 4)) + 1,
                "total_samples": ((b[13] & 0x0F) << 32)
                | int.from_bytes(b[14:18], "big"),
                "frames_start": _frames_start(data),
            }
        pos += blen
        if last:
            raise ValueError("flac: no STREAMINFO block")


def _frames_start(data: bytes) -> int | None:
    """Byte offset of the first audio frame; None when `data` is only the
    head of the file and later metadata blocks run past it (the
    num_samples fast path reads just the first few KB)."""
    pos = 4
    while True:
        if pos + 4 > len(data):
            return None
        last = data[pos] & 0x80
        blen = int.from_bytes(data[pos + 1 : pos + 4], "big")
        pos += 4 + blen
        if last:
            return pos if pos <= len(data) else None


def _decode_subframe(br: _Bits, bs: int, bps: int) -> np.ndarray:
    if br.read(1) != 0:
        raise ValueError("flac: bad subframe pad bit")
    stype = br.read(6)
    wasted = br.unary() + 1 if br.read(1) else 0
    eff = bps - wasted
    if not 0 < eff <= 32:
        raise ValueError("flac: bad effective sample size")

    if stype == 0:  # CONSTANT
        out = np.full(bs, br.sread(eff), dtype=np.int64)
    elif stype == 1:  # VERBATIM
        out = np.fromiter(
            (br.sread(eff) for _ in range(bs)), dtype=np.int64, count=bs
        )
    elif (stype & 0x38) == 0x08 and (stype & 0x07) <= 4:  # FIXED
        out = _predicted(br, bs, eff, order=stype & 0x07, lpc=False)
    elif stype & 0x20:  # LPC
        out = _predicted(br, bs, eff, order=(stype & 0x1F) + 1, lpc=True)
    else:
        raise ValueError(f"flac: reserved subframe type {stype}")
    return out << wasted if wasted else out


def _predicted(br: _Bits, bs: int, eff: int, order: int, lpc: bool) -> np.ndarray:
    if order > bs:
        raise ValueError("flac: predictor order exceeds blocksize")
    out = np.zeros(bs, dtype=np.int64)
    for i in range(order):
        out[i] = br.sread(eff)
    if lpc:
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("flac: invalid LPC precision code")
        shift = br.sread(5)
        if shift < 0:
            raise ValueError("flac: negative LPC shift")
        coefs = [br.sread(prec) for _ in range(order)]
    else:
        prec, shift, coefs = 0, 0, list(_FIXED_COEFS[order])

    # Residual: Rice partitions.
    method = br.read(2)
    if method > 1:
        raise ValueError("flac: reserved residual coding method")
    pbits, escape = (5, 0x1F) if method else (4, 0x0F)
    porder = br.read(4)
    nparts = 1 << porder
    if (bs >> porder) << porder != bs:
        raise ValueError("flac: partition order does not divide blocksize")
    idx = order
    for p in range(nparts):
        cnt = (bs >> porder) - (order if p == 0 else 0)
        if cnt < 0:
            raise ValueError("flac: order exceeds first partition")
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            for _ in range(cnt):
                out[idx] = br.sread(raw) if raw else 0
                idx += 1
        else:
            for _ in range(cnt):
                q = br.unary()
                z = (q << param) | (br.read(param) if param else 0)
                out[idx] = (z >> 1) ^ -(z & 1)
                idx += 1

    if not lpc and order == 0:
        return out
    for i in range(order, bs):
        acc = 0
        for j, c in enumerate(coefs):
            acc += c * int(out[i - 1 - j])
        out[i] += acc >> shift if lpc else acc
    return out


def flac_decode(data: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes -> (float32 samples of channel 0, sample_rate)."""
    si = parse_streaminfo(data)
    pos = si["frames_start"]
    if pos is None:
        raise ValueError("flac: truncated metadata")
    rate = si["sample_rate"]
    nch_si, bps_si = si["channels"], si["bits_per_sample"]
    chunks: list[np.ndarray] = []

    while pos + 2 <= len(data) and data[pos] == 0xFF and (data[pos + 1] & 0xFC) == 0xF8:
        frame_start = pos
        br = _Bits(data, pos)
        br.read(16)  # sync + reserved + blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        chan_code = br.read(4)
        ss_code = br.read(3)
        br.read(1)
        first = br.read(8)  # UTF-8-coded frame/sample number
        follow = 0
        m = 0x80
        while first & m:
            follow += 1
            m >>= 1
        if follow == 1 or follow > 6:
            raise ValueError("flac: bad coded frame number")
        for _ in range(max(follow - 1, 0)):
            if br.read(8) & 0xC0 != 0x80:
                raise ValueError("flac: bad coded frame number continuation")
        if bs_code == 0:
            raise ValueError("flac: reserved blocksize code")
        elif bs_code == 1:
            bs = 192
        elif bs_code <= 5:
            bs = 576 << (bs_code - 2)
        elif bs_code == 6:
            bs = br.read(8) + 1
        elif bs_code == 7:
            bs = br.read(16) + 1
        else:
            bs = 256 << (bs_code - 8)
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        elif sr_code == 15:
            raise ValueError("flac: invalid sample rate code")
        hdr_crc = br.read(8)
        if _crc8(data[frame_start : br.pos - 1]) != hdr_crc:
            raise ValueError("flac: frame header CRC-8 mismatch")

        if chan_code <= 7:
            nch = chan_code + 1
        elif chan_code <= 10:
            nch = 2
        else:
            raise ValueError("flac: reserved channel assignment")
        if nch != nch_si:
            raise ValueError("flac: frame channel count != STREAMINFO")
        bps = {0: bps_si, 1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}.get(ss_code)
        if bps is None:
            raise ValueError("flac: reserved sample size code")

        ch = []
        for c in range(nch):
            side = (
                (chan_code == 8 and c == 1)
                or (chan_code == 9 and c == 0)
                or (chan_code == 10 and c == 1)
            )
            ch.append(_decode_subframe(br, bs, bps + (1 if side else 0)))
        br.align()
        frame_crc = br.read(16)
        if _crc16(data[frame_start : br.pos - 2]) != frame_crc:
            raise ValueError("flac: frame CRC-16 mismatch")
        pos = br.pos

        if chan_code == 9:  # right/side: stored (side, right)
            ch[0] = ch[0] + ch[1]
        elif chan_code == 10:  # mid/side
            mid2 = (ch[0] << 1) | (ch[1] & 1)
            ch[0] = (mid2 + ch[1]) >> 1
        chunks.append(ch[0])

    if not chunks:
        raise ValueError("flac: no audio frames")
    return np.concatenate(chunks).astype(np.float32), rate

"""Minimal spec-following FLAC encoder — the offline test oracle.

No FLAC tool exists in this environment (no flac/ffmpeg/soundfile), so the
decoders in native/asr_native.cpp and data/flac.py are tested against this
independent, transparent encoder (VERDICT r2 item 1: "write a minimal FLAC
encoder in the test and assert bit-exact PCM roundtrip").  It emits every
construct the decoders claim to support, selectable per call:

  - subframe types: constant, verbatim, fixed (order 0-4), LPC (arbitrary
    caller-chosen coefficients/shift — legal FLAC regardless of whether
    they model the signal well)
  - Rice residuals: both coding methods, any partition order, escaped
    (raw) partitions, per-partition parameter search
  - stereo layouts: independent, left/side, right/side, mid/side
  - wasted bits
  - fixed blocksize with a short last frame

CRC-8 and CRC-16 are computed from the byte stream exactly as the spec
defines, which the decoders verify — a bit-packing desync on either side
fails the CRC check rather than silently corrupting samples.
"""

from __future__ import annotations

import numpy as np


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, k: int) -> None:
        assert k >= 0 and 0 <= value < (1 << k) if k else value == 0
        self.acc = (self.acc << k) | value
        self.nbits += k
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def swrite(self, value: int, k: int) -> None:
        self.write(value & ((1 << k) - 1), k)

    def unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


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


def _utf8_number(value: int) -> bytes:
    if value < 0x80:
        return bytes([value])
    out = []
    nbytes = 2
    while value >= (1 << (6 - nbytes + 1 + 6 * (nbytes - 1))):
        nbytes += 1
    lead_bits = 7 - nbytes
    out.append((0xFF ^ ((1 << (lead_bits + 1)) - 1)) | (value >> (6 * (nbytes - 1))))
    for i in range(nbytes - 2, -1, -1):
        out.append(0x80 | ((value >> (6 * i)) & 0x3F))
    return bytes(out)


_FIXED_COEFS = {0: (), 1: (1,), 2: (2, -1), 3: (3, -3, 1), 4: (4, -6, 4, -1)}
_SS_CODE = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}


def _zigzag(v: int) -> int:
    return (v << 1) if v >= 0 else (-(v << 1) - 1)


def _write_residual(
    bw: _BitWriter,
    res: np.ndarray,
    order: int,
    blocksize: int,
    partition_order: int,
    method: int,
    force_escape: bool,
) -> None:
    pbits, escape = (5, 0x1F) if method else (4, 0x0F)
    bw.write(method, 2)
    bw.write(partition_order, 4)
    idx = 0
    for p in range(1 << partition_order):
        cnt = (blocksize >> partition_order) - (order if p == 0 else 0)
        part = [int(v) for v in res[idx : idx + cnt]]
        idx += cnt
        if force_escape:
            raw = max((int(v).bit_length() + 1 for v in part), default=1)
            bw.write(escape, pbits)
            bw.write(raw, 5)
            for v in part:
                bw.swrite(v, raw)
            continue
        zz = [_zigzag(v) for v in part]
        best_param, best_bits = 0, None
        for param in range(escape):
            bits = sum((z >> param) + 1 + param for z in zz)
            if best_bits is None or bits < best_bits:
                best_param, best_bits = param, bits
        bw.write(best_param, pbits)
        for z in zz:
            bw.unary(z >> best_param)
            if best_param:
                bw.write(z & ((1 << best_param) - 1), best_param)


def _write_subframe(
    bw: _BitWriter,
    samples: np.ndarray,
    bps: int,
    kind: str,
    partition_order: int,
    rice_method: int,
    force_escape: bool,
    lpc_coefs=None,
    lpc_shift: int = 0,
    use_wasted: bool = False,
) -> None:
    samples = samples.astype(np.int64)
    bs = len(samples)
    bw.write(0, 1)  # pad

    wasted = 0
    if use_wasted and np.any(samples):
        ored = 0
        for v in samples:
            ored |= int(v)
        while wasted < bps - 1 and not (ored >> wasted) & 1:
            wasted += 1
        samples = samples >> wasted
    eff = bps - wasted

    if kind == "constant":
        assert np.all(samples == samples[0])
        bw.write(0, 6)
        _wasted_flag(bw, wasted)
        bw.swrite(int(samples[0]), eff)
        return
    if kind == "verbatim":
        bw.write(1, 6)
        _wasted_flag(bw, wasted)
        for v in samples:
            bw.swrite(int(v), eff)
        return
    if kind.startswith("fixed"):
        order = int(kind.split(":")[1])
        bw.write(0x08 | order, 6)
        _wasted_flag(bw, wasted)
        for v in samples[:order]:
            bw.swrite(int(v), eff)
        res = samples.copy()
        coefs = _FIXED_COEFS[order]
        for i in range(bs - 1, order - 1, -1):
            pred = sum(c * int(samples[i - 1 - j]) for j, c in enumerate(coefs))
            res[i] = int(samples[i]) - pred
        _write_residual(
            bw, res[order:], order, bs, partition_order, rice_method, force_escape
        )
        return
    if kind == "lpc":
        coefs = list(lpc_coefs)
        order = len(coefs)
        prec = max(max(int(c).bit_length() + 1 for c in coefs), 2)
        assert prec <= 15
        bw.write(0x20 | (order - 1), 6)
        _wasted_flag(bw, wasted)
        for v in samples[:order]:
            bw.swrite(int(v), eff)
        bw.write(prec - 1, 4)
        bw.swrite(lpc_shift, 5)
        for c in coefs:
            bw.swrite(int(c), prec)
        res = samples.copy()
        for i in range(bs - 1, order - 1, -1):
            acc = sum(c * int(samples[i - 1 - j]) for j, c in enumerate(coefs))
            res[i] = int(samples[i]) - (acc >> lpc_shift)
        _write_residual(
            bw, res[order:], order, bs, partition_order, rice_method, force_escape
        )
        return
    raise ValueError(f"unknown subframe kind {kind}")


def _wasted_flag(bw: _BitWriter, wasted: int) -> None:
    if wasted:
        bw.write(1, 1)
        bw.unary(wasted - 1)
    else:
        bw.write(0, 1)


def encode_flac(
    samples: np.ndarray,
    sample_rate: int = 16000,
    bps: int = 16,
    blocksize: int = 4096,
    kind: str = "fixed:2",
    stereo_mode: str = "independent",
    partition_order: int = 0,
    rice_method: int = 0,
    force_escape: bool = False,
    lpc_coefs=(3, -1),
    lpc_shift: int = 1,
    use_wasted: bool = False,
) -> bytes:
    """Encode int samples ([N] mono or [N, 2] stereo) as a FLAC stream."""
    samples = np.asarray(samples, dtype=np.int64)
    if samples.ndim == 1:
        samples = samples[:, None]
    n, nch = samples.shape
    assert nch in (1, 2)
    lim = 1 << (bps - 1)
    assert samples.min() >= -lim and samples.max() < lim

    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(blocksize, 16)  # min blocksize
    si.write(blocksize, 16)  # max blocksize
    si.write(0, 24)  # min framesize (unknown)
    si.write(0, 24)  # max framesize (unknown)
    si.write(sample_rate, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    for _ in range(16):  # MD5 (unset)
        si.write(0, 8)
    body = si.bytes()
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body  # last block

    chan_code = {
        "independent": nch - 1,
        "left_side": 8,
        "right_side": 9,
        "mid_side": 10,
    }[stereo_mode]
    if stereo_mode != "independent":
        assert nch == 2

    for frame_idx, start in enumerate(range(0, n, blocksize)):
        block = samples[start : start + blocksize]
        bs = len(block)
        bw = _BitWriter()
        bw.write(0x3FFE, 14)  # sync
        bw.write(0, 1)  # reserved
        bw.write(0, 1)  # fixed blocksize stream
        bw.write(7, 4)  # blocksize: 16-bit value-1 at header end
        bw.write(0, 4)  # sample rate: from STREAMINFO
        bw.write(chan_code, 4)
        bw.write(_SS_CODE.get(bps, 0), 3)
        bw.write(0, 1)  # reserved
        for byte in _utf8_number(frame_idx):
            bw.write(byte, 8)
        bw.write(bs - 1, 16)
        bw.align()
        hdr = bw.bytes()
        bw = _BitWriter()
        for byte in hdr:
            bw.write(byte, 8)
        bw.write(_crc8(hdr), 8)

        left = block[:, 0]
        if nch == 1:
            chans = [(left, bps)]
        elif stereo_mode == "independent":
            chans = [(left, bps), (block[:, 1], bps)]
        else:
            right = block[:, 1]
            side = left - right
            if stereo_mode == "left_side":
                chans = [(left, bps), (side, bps + 1)]
            elif stereo_mode == "right_side":
                chans = [(side, bps + 1), (right, bps)]
            else:  # mid_side
                mid = (left + right) >> 1
                chans = [(mid, bps), (side, bps + 1)]
        for ch, ch_bps in chans:
            ch_kind = kind
            if kind == "constant" and not np.all(ch == ch[0]):
                ch_kind = "verbatim"
            _write_subframe(
                bw,
                ch,
                ch_bps,
                ch_kind,
                partition_order if bs >> partition_order << partition_order == bs else 0,
                rice_method,
                force_escape,
                lpc_coefs=lpc_coefs,
                lpc_shift=lpc_shift,
                use_wasted=use_wasted,
            )
        bw.align()
        frame = bw.bytes()
        out += frame + _crc16(frame).to_bytes(2, "big")
    return bytes(out)

"""Numpy feature-extraction oracle: framing, STFT, log-mel, MFCC.

Pins the exact feature formulas (the parity-critical constants of SURVEY.md
§2 L2; the reference idiom is python_speech_features-style).  Constants:

  pre-emphasis 0.97; frame 25 ms / hop 10 ms; Hamming window (periodic);
  n_fft 512; power spectrum |FFT|^2 / n_fft; HTK mel scale
  2595*log10(1 + f/700); natural log with 1e-10 floor; DCT-II (ortho) for
  MFCC.

The on-device pipeline (neuralasr_tpu/features/) must match this allclose.
"""

from __future__ import annotations

import numpy as np

SAMPLE_RATE = 16000
FRAME_LEN = 400  # 25 ms @ 16 kHz
HOP_LEN = 160  # 10 ms @ 16 kHz
N_FFT = 512
PREEMPH = 0.97
LOG_FLOOR = 1e-10


def preemphasis(signal: np.ndarray, coeff: float = PREEMPH) -> np.ndarray:
    """y[0] = x[0]; y[t] = x[t] - coeff * x[t-1]."""
    return np.concatenate([signal[:1], signal[1:] - coeff * signal[:-1]])


def num_frames(num_samples: int, frame_len: int = FRAME_LEN, hop: int = HOP_LEN) -> int:
    """Frames that fit entirely inside the signal (no end-padding)."""
    if num_samples < frame_len:
        return 0
    return 1 + (num_samples - frame_len) // hop


def frame_signal(
    signal: np.ndarray, frame_len: int = FRAME_LEN, hop: int = HOP_LEN
) -> np.ndarray:
    """[N] -> [T, frame_len] overlapping frames, no end-padding."""
    T = num_frames(len(signal), frame_len, hop)
    idx = np.arange(frame_len)[None, :] + hop * np.arange(T)[:, None]
    return signal[idx]


def hamming(frame_len: int = FRAME_LEN) -> np.ndarray:
    """Periodic Hamming window (matches np.hamming's symmetric? No — we pin
    the *symmetric* numpy definition, 0.54 - 0.46 cos(2 pi n / (M-1))."""
    return np.hamming(frame_len)


def power_spectrum(frames: np.ndarray, n_fft: int = N_FFT) -> np.ndarray:
    """[T, frame_len] windowed frames -> [T, n_fft//2+1] power spectrum."""
    spec = np.fft.rfft(frames, n=n_fft, axis=-1)
    return (spec.real**2 + spec.imag**2) / n_fft


def hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(
    n_mels: int,
    n_fft: int = N_FFT,
    sample_rate: int = SAMPLE_RATE,
    f_min: float = 0.0,
    f_max: float | None = None,
) -> np.ndarray:
    """Triangular HTK-style mel filterbank, shape [n_fft//2+1, n_mels]."""
    f_max = f_max if f_max is not None else sample_rate / 2.0
    mel_pts = np.linspace(hz_to_mel(f_min), hz_to_mel(f_max), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)
    bins = np.floor((n_fft + 1) * hz_pts / sample_rate).astype(np.int64)
    fb = np.zeros((n_fft // 2 + 1, n_mels))
    for m in range(1, n_mels + 1):
        lo, ctr, hi = bins[m - 1], bins[m], bins[m + 1]
        for k in range(lo, ctr):
            if ctr > lo:
                fb[k, m - 1] = (k - lo) / (ctr - lo)
        for k in range(ctr, hi):
            if hi > ctr:
                fb[k, m - 1] = (hi - k) / (hi - ctr)
    return fb


def dct_matrix(n_out: int, n_in: int) -> np.ndarray:
    """DCT-II with ortho norm as a matrix, shape [n_in, n_out]."""
    k = np.arange(n_out)[None, :]
    n = np.arange(n_in)[:, None]
    m = np.cos(np.pi * k * (2 * n + 1) / (2 * n_in)) * np.sqrt(2.0 / n_in)
    m[:, 0] *= np.sqrt(0.5)
    return m


def log_mel(
    signal: np.ndarray,
    n_mels: int = 80,
    sample_rate: int = SAMPLE_RATE,
) -> np.ndarray:
    """Waveform [N] -> log-mel features [T, n_mels]."""
    x = preemphasis(np.asarray(signal, dtype=np.float64))
    frames = frame_signal(x) * hamming()
    pspec = power_spectrum(frames)
    fb = mel_filterbank(n_mels, sample_rate=sample_rate)
    return np.log(np.maximum(pspec @ fb, LOG_FLOOR))


def mfcc(
    signal: np.ndarray,
    n_mfcc: int = 13,
    n_mels: int = 26,
    sample_rate: int = SAMPLE_RATE,
) -> np.ndarray:
    """Waveform [N] -> MFCC features [T, n_mfcc]."""
    lm = log_mel(signal, n_mels=n_mels, sample_rate=sample_rate)
    return lm @ dct_matrix(n_mfcc, n_mels)

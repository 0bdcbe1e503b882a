"""Jitted feature frontend: waveform [B, N] -> features [B, T, F] + lengths.

Pipeline (constants cross-checked against reference/mfcc_oracle.py AND
independent scipy formulas — tests/test_features.py; the mel filterbank and
DCT matrix are constructed HERE, independently of the oracle, so the parity
tests can catch a wrong constant on either side):
  pre-emphasis 0.97 -> frame 400/hop 160 (gather) -> Hamming window ->
  power spectrum via DFT-by-matmul (|frames @ C|^2 + |frames @ S|^2)/n_fft
  -> mel filterbank matmul -> log -> (MFCC: DCT matmul) -> optional
  per-utterance CMVN over true length.

All matmuls run on the MXU in one jit'd program; padded tail frames are
computed-and-ignored (masked by feat_lens downstream) — static shapes, no
data-dependent control flow.
"""

from __future__ import annotations

import dataclasses


import numpy as np
import jax
import jax.numpy as jnp

LOG_FLOOR = 1e-10  # natural-log floor (matches reference/mfcc_oracle.py)


def mel_filterbank(
    n_mels: int, n_fft: int, sample_rate: int, f_min: float = 0.0
) -> np.ndarray:
    """HTK-mel triangular filterbank [n_fft//2+1, n_mels].

    Deliberately an independent construction from the oracle's (vectorized
    ramps vs its per-bin loops) so agreement between the two is evidence,
    not circularity: mel(f) = 2595*log10(1+f/700), n_mels+2 equally spaced
    mel points, triangles over FFT-bin indices floor((n_fft+1)*f/sr).
    """
    f_max = sample_rate / 2.0
    mel = lambda f: 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)
    inv = lambda m: 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)
    hz_pts = inv(np.linspace(mel(f_min), mel(f_max), n_mels + 2))
    bins = np.floor((n_fft + 1) * hz_pts / sample_rate).astype(np.int64)
    k = np.arange(n_fft // 2 + 1)[:, None].astype(np.float64)  # [K, 1]
    lo, ctr, hi = bins[None, :-2], bins[None, 1:-1], bins[None, 2:]  # [1, M]
    up = np.where(ctr > lo, (k - lo) / np.maximum(ctr - lo, 1), 0.0)
    down = np.where(hi > ctr, (hi - k) / np.maximum(hi - ctr, 1), 0.0)
    fb = np.where(k < ctr, up, down)
    fb = np.where((k >= lo) & (k < hi), fb, 0.0)
    return fb


def dct_matrix(n_out: int, n_in: int) -> np.ndarray:
    """Orthonormal DCT-II as a matrix [n_in, n_out]: feats @ M == scipy
    fft.dct(feats, type=2, norm='ortho')[:, :n_out] (pinned by tests)."""
    n = np.arange(n_in)[:, None]
    k = np.arange(n_out)[None, :]
    m = np.cos(np.pi * (2 * n + 1) * k / (2.0 * n_in)) * np.sqrt(2.0 / n_in)
    m[:, 0] *= np.sqrt(0.5)
    return m


@dataclasses.dataclass(frozen=True)
class FeatureConfig:
    feature_type: str = "mfcc"  # "mfcc" | "logmel"
    sample_rate: int = 16000
    frame_len: int = 400
    hop: int = 160
    n_fft: int = 512
    n_mels: int = 26  # 26 for MFCC path, 80 for logmel path
    n_mfcc: int = 13
    preemph: float = 0.97
    cmvn: bool = True
    use_pallas: bool = False  # fused VMEM kernel (ops/pallas_frontend.py)
    # "gather": materialize [B, T, frame_len] frames then matmul the DFT.
    # "conv": framing+window+DFT as ONE strided convolution (filters =
    # windowed DFT basis, stride = hop) — no [B, T, frame_len] intermediate
    # ever reaches HBM; XLA lowers the conv onto the MXU directly.
    frontend_impl: str = "gather"
    # "bfloat16" halves the HBM traffic of the framing/DFT stage (its big
    # operands: waveform rows, frames, DFT basis); the MXU still
    # accumulates in f32 and power/log/CMVN stay f32.  Parity vs the f32
    # path is ~1e-2 on CMVN'd features (tests/test_features.py) — below
    # the training noise floor, but keep f32 for oracle-parity work.
    compute_dtype: str = "float32"
    # Framed-Pallas-kernel tuning (round-4 sweep, VERDICT r3 item 6):
    # frames per grid program; 256 is the measured optimum (384/512 within
    # tunnel noise).  pallas_dft_acc="bfloat16" is MEASURED-UNVIABLE and
    # kept only as the recorded A/B: the DFT partial sums cancel
    # catastrophically in bf16 (max_err ~6.7 on CMVN'd features, CPU
    # preflight) and Mosaic rejects bf16 matmul accumulators on TPU
    # anyway ("Expected matmul acc to be 32-bit") — do not ship it.
    pallas_block_frames: int = 256
    pallas_dft_acc: str = "float32"

    @property
    def dim(self) -> int:
        return self.n_mfcc if self.feature_type == "mfcc" else self.n_mels


def num_frames(num_samples, frame_len: int = 400, hop: int = 160):
    """Frames fully inside the signal (matches oracle.num_frames); works on
    ints and arrays."""
    n = (num_samples - frame_len) // hop + 1
    return np.maximum(n, 0) if isinstance(n, np.ndarray) else jnp.maximum(n, 0)


def _dft_matrices(frame_len: int, n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real-DFT basis restricted to the first frame_len rows (zero-padding to
    n_fft contributes nothing, so the matmul skips it entirely)."""
    n = np.arange(frame_len)[:, None]
    k = np.arange(n_fft // 2 + 1)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    return np.cos(ang), -np.sin(ang)  # [frame_len, n_fft//2+1] each


def make_frontend(cfg: FeatureConfig, max_frames: int):
    """Builds a jittable frontend for fixed max_frames (bucketed shapes).

    Returns fn(wav [B, N] float32, wav_lens [B] int32) ->
      (feats [B, max_frames, cfg.dim] float32, feat_lens [B] int32).
    N must be >= frame_len + hop*(max_frames-1).
    """
    window = np.hamming(cfg.frame_len)
    C, S = _dft_matrices(cfg.frame_len, cfg.n_fft)
    cdtype = jnp.dtype(cfg.compute_dtype)
    # Fold the window into the DFT matrices: (f*w) @ C == f @ (w[:,None]*C).
    wC = jnp.asarray(window[:, None] * C, dtype=cdtype)
    wS = jnp.asarray(window[:, None] * S, dtype=cdtype)
    fb = jnp.asarray(
        mel_filterbank(cfg.n_mels, cfg.n_fft, cfg.sample_rate),
        dtype=jnp.float32,
    )
    dct = jnp.asarray(dct_matrix(cfg.n_mfcc, cfg.n_mels), dtype=jnp.float32)
    frame_idx = jnp.asarray(
        np.arange(cfg.frame_len)[None, :]
        + cfg.hop * np.arange(max_frames)[:, None]
    )  # [max_frames, frame_len]

    def _postprocess(feats, feat_lens):
        if cfg.cmvn:
            t_idx = jnp.arange(max_frames)[None, :, None]
            mask = (t_idx < feat_lens[:, None, None]).astype(feats.dtype)
            cnt = jnp.maximum(mask.sum(axis=1, keepdims=True), 1.0)
            mean = (feats * mask).sum(axis=1, keepdims=True) / cnt
            var = ((feats - mean) ** 2 * mask).sum(axis=1, keepdims=True) / cnt
            feats = (feats - mean) * jax.lax.rsqrt(var + 1e-8)
            feats = feats * mask
        return feats, feat_lens

    @jax.jit
    def frontend(wav: jnp.ndarray, wav_lens: jnp.ndarray):
        wav = wav.astype(jnp.float32)  # int16 PCM wire format -> f32 on device
        B, N = wav.shape
        # Pre-emphasis: y[0] = x[0], y[t] = x[t] - a*x[t-1].
        shifted = jnp.concatenate([wav[:, :1] * 0, wav[:, :-1]], axis=1)
        y = wav - cfg.preemph * shifted
        y = y.at[:, 0].set(wav[:, 0])
        y = y.astype(cdtype)  # bf16 halves the framing/DFT HBM traffic
        feat_lens = num_frames(wav_lens, cfg.frame_len, cfg.hop).astype(
            jnp.int32
        )

        if cfg.use_pallas:
            # Fully fused kernel INCLUDING framing: the [B, T, frame_len]
            # frames tensor never exists (ops/pallas_frontend.py).
            from ..ops.pallas_frontend import fused_frontend_framed

            wdft = jnp.concatenate([wC, wS], axis=1)  # [frame_len, 2K]
            post = (
                dct
                if cfg.feature_type == "mfcc"
                else jnp.eye(cfg.n_mels, dtype=jnp.float32)
            )
            feats = fused_frontend_framed(
                y, max_frames, wdft, fb, post, cfg.n_fft, LOG_FLOOR,
                cfg.hop, cfg.frame_len,
                block_frames=cfg.pallas_block_frames,
                acc_dtype=jnp.dtype(cfg.pallas_dft_acc),
            )
            return _postprocess(feats, feat_lens)

        if cfg.frontend_impl == "conv":
            # Framing + window + rDFT as a strided conv: out[b, k, t] =
            # sum_n y[b, t*hop + n] * wdft[n, k].  Exactly the gather+matmul
            # result, but the [B, T, frame_len] frames tensor never exists.
            wdft = jnp.concatenate([wC, wS], axis=1)  # [frame_len, 2K]
            kern = wdft.T[:, None, :]  # [2K, 1, frame_len] (OIW)
            usable = cfg.frame_len + cfg.hop * (max_frames - 1)
            out = jax.lax.conv_general_dilated(
                y[:, None, :usable],  # [B, 1, N'] (NCW)
                kern,
                window_strides=(cfg.hop,),
                padding="VALID",
                preferred_element_type=jnp.float32,
            )  # [B, 2K, T]
            out = jnp.transpose(out, (0, 2, 1))  # [B, T, 2K]
            K = cfg.n_fft // 2 + 1
            re, im = out[..., :K], out[..., K:]
        else:
            frames = y[:, frame_idx]  # [B, T, frame_len] gather
            re = (frames @ wC).astype(jnp.float32)  # MXU, f32 accumulation
            im = (frames @ wS).astype(jnp.float32)
        pspec = (re * re + im * im) / cfg.n_fft
        logmel = jnp.log(jnp.maximum(pspec @ fb, LOG_FLOOR))
        feats = logmel @ dct if cfg.feature_type == "mfcc" else logmel
        return _postprocess(feats, feat_lens)

    return frontend

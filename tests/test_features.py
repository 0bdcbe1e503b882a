"""Feature-pipeline parity vs the numpy oracle (SURVEY.md §5.1)."""

import numpy as np
import jax.numpy as jnp

from neuralasr_tpu.features import FeatureConfig, make_frontend, num_frames
from neuralasr_tpu.reference import mfcc_oracle as oracle


def _wav(rng, n):
    # Speech-ish: sum of chirps + noise, int16-scaled like real PCM.
    t = np.arange(n) / 16000.0
    x = (
        0.5 * np.sin(2 * np.pi * (200 + 80 * t) * t)
        + 0.3 * np.sin(2 * np.pi * 700 * t)
        + 0.1 * rng.normal(size=n)
    )
    return (x * 8000).astype(np.float32)


def test_dct_matrix_matches_scipy():
    """Both independent DCT constructions == scipy's ortho DCT-II (breaks
    the oracle<->frontend circularity flagged in VERDICT.md weak #1)."""
    from scipy.fft import dct as scipy_dct

    from neuralasr_tpu.features.frontend import dct_matrix as fe_dct

    for n_out, n_in in [(13, 26), (20, 80), (26, 26)]:
        x = np.random.default_rng(0).normal(size=(5, n_in))
        want = scipy_dct(x, type=2, norm="ortho", axis=-1)[:, :n_out]
        np.testing.assert_allclose(x @ fe_dct(n_out, n_in), want, atol=1e-12)
        np.testing.assert_allclose(
            x @ oracle.dct_matrix(n_out, n_in), want, atol=1e-12
        )


def test_mel_filterbank_independent_constructions_agree():
    """Frontend's vectorized HTK filterbank == oracle's loop construction,
    and both satisfy hand-derived HTK invariants."""
    from neuralasr_tpu.features.frontend import mel_filterbank as fe_fb

    for n_mels, n_fft, sr in [(26, 512, 16000), (80, 512, 16000), (40, 1024, 8000)]:
        a = fe_fb(n_mels, n_fft, sr)
        b = oracle.mel_filterbank(n_mels, n_fft, sr)
        np.testing.assert_allclose(a, b, atol=1e-12)
        # HTK invariants, derived independently of either implementation:
        # triangle peaks sit at floor((n_fft+1)*hz/sr) for the n_mels centre
        # points of the 2595*log10(1+f/700) scale.
        mel_max = 2595.0 * np.log10(1.0 + (sr / 2.0) / 700.0)
        pts = 700.0 * (10.0 ** (np.linspace(0, mel_max, n_mels + 2) / 2595.0) - 1.0)
        centers = np.floor((n_fft + 1) * pts[1:-1] / sr).astype(int)
        lo = np.floor((n_fft + 1) * pts[:-2] / sr).astype(int)
        hi = np.floor((n_fft + 1) * pts[2:] / sr).astype(int)
        for m in range(n_mels):
            if centers[m] > lo[m] and hi[m] > centers[m]:  # non-degenerate
                assert a[centers[m], m] == 1.0, (m, centers[m])
        assert a.shape == (n_fft // 2 + 1, n_mels)
        assert (a >= 0).all() and (a <= 1).all()


def test_num_frames_matches_oracle():
    for n in [0, 399, 400, 401, 559, 560, 16000]:
        assert int(num_frames(n)) == oracle.num_frames(n)


def test_mfcc_matches_oracle():
    rng = np.random.default_rng(0)
    n = 16000
    wav = _wav(rng, n)
    cfg = FeatureConfig(feature_type="mfcc", cmvn=False)
    T = oracle.num_frames(n)
    fe = make_frontend(cfg, max_frames=T)
    feats, lens = fe(jnp.asarray(wav[None]), jnp.asarray([n]))
    want = oracle.mfcc(wav, n_mfcc=cfg.n_mfcc, n_mels=cfg.n_mels)
    assert int(lens[0]) == T
    np.testing.assert_allclose(
        np.asarray(feats)[0], want, rtol=2e-3, atol=2e-3
    )


def test_logmel_matches_oracle():
    rng = np.random.default_rng(1)
    n = 8000
    wav = _wav(rng, n)
    cfg = FeatureConfig(feature_type="logmel", n_mels=80, cmvn=False)
    T = oracle.num_frames(n)
    fe = make_frontend(cfg, max_frames=T)
    feats, _ = fe(jnp.asarray(wav[None]), jnp.asarray([n]))
    want = oracle.log_mel(wav, n_mels=80)
    np.testing.assert_allclose(
        np.asarray(feats)[0], want, rtol=2e-3, atol=2e-3
    )


def test_batched_lengths_and_padding():
    rng = np.random.default_rng(2)
    n1, n2 = 6000, 4000
    w1, w2 = _wav(rng, n1), _wav(rng, n2)
    N = 8000
    batch = np.zeros((2, N), dtype=np.float32)
    batch[0, :n1] = w1
    batch[1, :n2] = w2
    batch[1, n2:] = 12345.0  # poison padding
    cfg = FeatureConfig(feature_type="mfcc", cmvn=False)
    Tmax = oracle.num_frames(N)
    fe = make_frontend(cfg, max_frames=Tmax)
    feats, lens = fe(jnp.asarray(batch), jnp.asarray([n1, n2]))
    t2 = oracle.num_frames(n2)
    assert int(lens[0]) == oracle.num_frames(n1)
    assert int(lens[1]) == t2
    want2 = oracle.mfcc(w2, n_mfcc=cfg.n_mfcc, n_mels=cfg.n_mels)
    np.testing.assert_allclose(
        np.asarray(feats)[1, :t2], want2, rtol=2e-3, atol=2e-3
    )


def test_cmvn_masked():
    rng = np.random.default_rng(3)
    n = 5000
    wav = _wav(rng, n)
    N = 9000
    padded = np.zeros((1, N), dtype=np.float32)
    padded[0, :n] = wav
    cfg = FeatureConfig(feature_type="mfcc", cmvn=True)
    Tmax = oracle.num_frames(N)
    fe = make_frontend(cfg, max_frames=Tmax)
    feats, lens = fe(jnp.asarray(padded), jnp.asarray([n]))
    t = int(lens[0])
    valid = np.asarray(feats)[0, :t]
    # CMVN over true length: mean ~0, var ~1 per coefficient.
    np.testing.assert_allclose(valid.mean(axis=0), 0.0, atol=1e-4)
    np.testing.assert_allclose(valid.var(axis=0), 1.0, atol=1e-2)
    # Padded frames zeroed.
    np.testing.assert_allclose(np.asarray(feats)[0, t:], 0.0, atol=1e-6)


def test_pallas_frontend_matches_xla():
    import jax.numpy as jnp

    rng = np.random.default_rng(4)
    n = 8000
    wav = _wav(rng, n)
    T = oracle.num_frames(n)
    for ftype, n_mels in (("mfcc", 26), ("logmel", 80)):
        cfg_x = FeatureConfig(feature_type=ftype, n_mels=n_mels, cmvn=False)
        cfg_p = FeatureConfig(
            feature_type=ftype, n_mels=n_mels, cmvn=False, use_pallas=True
        )
        fx = make_frontend(cfg_x, max_frames=T)
        fp = make_frontend(cfg_p, max_frames=T)
        a, _ = fx(jnp.asarray(wav[None]), jnp.asarray([n]))
        b, _ = fp(jnp.asarray(wav[None]), jnp.asarray([n]))
        # 5e-4: the framed kernel's block boundaries reassociate the f32
        # DFT sums slightly differently from the gather+matmul path.
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4
        )


def test_pallas_framed_kernel_matches_unframed():
    """The framing-fused kernel (waveform in, manual DMA of overlapping hop
    rows) must equal the frames-in kernel exactly — same VMEM math, only
    the frame assembly differs."""
    import jax.numpy as jnp

    from neuralasr_tpu.features.frontend import (
        LOG_FLOOR, _dft_matrices, dct_matrix, mel_filterbank,
    )
    from neuralasr_tpu.ops.pallas_frontend import (
        fused_frontend, fused_frontend_framed,
    )

    rng = np.random.default_rng(11)
    B, N, fl, hop, n_fft = 2, 8000, 400, 160, 512
    y = np.stack([_wav(rng, N), _wav(rng, N)]).astype(np.float32)
    T = (N - fl) // hop + 1
    window = np.hamming(fl)
    C, S = _dft_matrices(fl, n_fft)
    wdft = jnp.asarray(
        np.concatenate([window[:, None] * C, window[:, None] * S], axis=1),
        jnp.float32,
    )
    fb = jnp.asarray(mel_filterbank(26, n_fft, 16000), jnp.float32)
    post = jnp.asarray(dct_matrix(13, 26), jnp.float32)

    idx = np.arange(fl)[None, :] + hop * np.arange(T)[:, None]
    frames = jnp.asarray(y[:, idx].reshape(B * T, fl))
    a = fused_frontend(frames, wdft, fb, post, n_fft, LOG_FLOOR)
    b = fused_frontend_framed(
        jnp.asarray(y), T, wdft, fb, post, n_fft, LOG_FLOOR, hop, fl,
        block_frames=16,  # force several blocks per utterance
    )
    np.testing.assert_allclose(
        np.asarray(a).reshape(B, T, -1), np.asarray(b), rtol=1e-5, atol=1e-5
    )


def test_bf16_compute_dtype_parity():
    """compute_dtype='bfloat16' must track the f32 path closely in bulk.

    The error profile is bimodal by construction: high-energy bins match to
    ~1e-2 (bf16 mantissa at the MXU's f32 accumulation), while near-silent
    bins — whose DFT value is a catastrophic cancellation of large products
    — can drift O(1) in log space (they are numerical noise in f32 too).
    So the bound is distributional: tight median/mean, loose extreme tail.
    """
    import jax.numpy as jnp

    rng = np.random.default_rng(12)
    n = 8000
    wav = _wav(rng, n)
    T = oracle.num_frames(n)
    for impl in ("gather", "conv"):
        cfg32 = FeatureConfig(feature_type="logmel", n_mels=80, cmvn=True,
                              frontend_impl=impl)
        cfg16 = FeatureConfig(feature_type="logmel", n_mels=80, cmvn=True,
                              frontend_impl=impl, compute_dtype="bfloat16")
        a, _ = make_frontend(cfg32, T)(jnp.asarray(wav[None]), jnp.asarray([n]))
        b, _ = make_frontend(cfg16, T)(jnp.asarray(wav[None]), jnp.asarray([n]))
        err = np.abs(np.asarray(a) - np.asarray(b))
        stats = (impl, float(np.median(err)), float(err.mean()),
                 float(np.percentile(err, 99)), float(err.max()))
        assert np.median(err) < 0.01, stats
        assert err.mean() < 0.03, stats
        assert np.percentile(err, 99) < 0.5, stats
        assert err.max() < 3.0, stats


def test_conv_frontend_matches_gather():
    """frontend_impl='conv' (framing+window+DFT as one strided conv) must
    equal the gather+matmul path bit-for-bit-ish on both feature types."""
    rng = np.random.default_rng(7)
    n1, n2 = 7000, 4500
    N = 8000
    batch = np.zeros((2, N), dtype=np.float32)
    batch[0, :n1] = _wav(rng, n1)
    batch[1, :n2] = _wav(rng, n2)
    T = oracle.num_frames(N)
    for ftype, n_mels in (("mfcc", 26), ("logmel", 80)):
        for cmvn in (False, True):
            cfg_g = FeatureConfig(feature_type=ftype, n_mels=n_mels, cmvn=cmvn)
            cfg_c = FeatureConfig(
                feature_type=ftype, n_mels=n_mels, cmvn=cmvn,
                frontend_impl="conv",
            )
            fg = make_frontend(cfg_g, max_frames=T)
            fc = make_frontend(cfg_c, max_frames=T)
            a, la = fg(jnp.asarray(batch), jnp.asarray([n1, n2]))
            b, lb = fc(jnp.asarray(batch), jnp.asarray([n1, n2]))
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
            # Compare within true lengths only: frames over pure zero
            # padding sit at the log floor, where ~1e-30-scale conv-vs-
            # matmul float noise flips log(max(p, FLOOR)) discontinuously.
            for r, ln in enumerate(np.asarray(la)):
                np.testing.assert_allclose(
                    np.asarray(a)[r, :ln],
                    np.asarray(b)[r, :ln],
                    rtol=1e-3,
                    atol=1e-3,
                )

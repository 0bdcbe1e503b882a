"""Fused feature-extraction Pallas kernel (window+DFT+power+mel+log[+DCT]).

BASELINE.json: "feature-extraction FFT run at speed-of-light per chip".
The pipeline per frame is window -> rDFT (as a [400, 2*257] matmul — for
n_fft=512 a dense DFT matmul on the MXU beats butterfly FFTs, which XLA
can't tile onto the systolic array) -> power -> mel matmul -> log -> (DCT
matmul).  XLA materializes the [B*T, 514] spectrum and [B*T, 257] power in
HBM between those ops; this kernel keeps every intermediate in VMEM, so the
HBM traffic is exactly frames-in (400 f32/frame) + features-out (n_mels or
n_mfcc f32/frame) — the bandwidth speed-of-light for this op.

Framing itself stays an XLA gather (overlapping 400/160 windows; ~2.5x wav
bytes, negligible).  Off-TPU the kernel runs in interpret mode.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(frames_ref, wdft_ref, mel_ref, post_ref, out_ref, *, n_fft, floor):
    frames = frames_ref[:]  # [BF, frame_len]
    m = jax.lax.dot_general(
        frames,
        wdft_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [BF, 2*(n_fft//2+1)] — windowed rDFT (re | im halves)
    nb = m.shape[1] // 2
    p = (m[:, :nb] ** 2 + m[:, nb:] ** 2) * (1.0 / n_fft)
    mel = jax.lax.dot_general(
        p,
        mel_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    lm = jnp.log(jnp.maximum(mel, floor))
    out_ref[:] = jax.lax.dot_general(
        lm,
        post_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def fused_frontend(
    frames: jnp.ndarray,  # [NF, frame_len] pre-emphasized, un-windowed frames
    wdft: jnp.ndarray,  # [frame_len, 2*(n_fft//2+1)] window-folded rDFT basis
    mel_fb: jnp.ndarray,  # [n_fft//2+1, n_mels]
    post: jnp.ndarray,  # [n_mels, F_out] — DCT matrix for MFCC, identity for log-mel
    n_fft: int,
    floor: float,
    block_frames: int = 256,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """[NF, frame_len] frames -> [NF, F_out] features, one fused kernel."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    NF, FL = frames.shape
    F_out = post.shape[1]
    bf = min(block_frames, NF)
    # Pad frame count to a block multiple (Pallas grids tile evenly; padded
    # rows compute garbage that the caller slices off).
    NF_pad = -(-NF // bf) * bf
    if NF_pad != NF:
        frames = jnp.pad(frames, ((0, NF_pad - NF), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_kernel, n_fft=n_fft, floor=floor),
        grid=(NF_pad // bf,),
        in_specs=[
            pl.BlockSpec((bf, FL), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (FL, wdft.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (mel_fb.shape[0], mel_fb.shape[1]),
                lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (post.shape[0], post.shape[1]),
                lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (bf, F_out), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((NF_pad, F_out), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * NF_pad * FL * wdft.shape[1]
            + 2 * NF_pad * mel_fb.shape[0] * mel_fb.shape[1]
            + 2 * NF_pad * post.shape[0] * F_out,
            bytes_accessed=4 * (NF_pad * FL + NF_pad * F_out),
            transcendentals=NF_pad * mel_fb.shape[1],
        ),
    )(frames, wdft, mel_fb, post)
    return out[:NF]

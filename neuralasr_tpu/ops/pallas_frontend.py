"""Fused feature-extraction Pallas kernels (framing+window+DFT+power+mel+
log[+DCT]).

BASELINE.json: "feature-extraction FFT run at speed-of-light per chip".
The pipeline per frame is window -> rDFT (as a [400, 2*257] matmul — for
n_fft=512 a dense DFT matmul on the MXU beats butterfly FFTs, which XLA
can't tile onto the systolic array) -> power -> mel matmul -> log -> (DCT
matmul).

Two kernels:

- `fused_frontend` takes pre-gathered [NF, frame_len] frames and keeps the
  spectrum/power/mel intermediates in VMEM (HBM traffic = frames in +
  features out).
- `fused_frontend_framed` goes further and folds the FRAMING in: the raw
  pre-emphasized waveform (reshaped to hop-sized rows) streams in as two
  grid-blocked views offset by one block (overlap via the grid — Mosaic
  rejects dynamic-offset slices of tiled memrefs, so no manual DMA), and
  each frame's DFT is computed as k sublane-shifted partial matmuls, so
  the [B, T, frame_len] frames tensor — ~2.5x the wav bytes, by far the
  largest array the round-2 frontend touched (VERDICT r2 item 2a) — never
  exists anywhere.  HBM traffic drops to ~2x wav-in + features-out, the
  bandwidth speed-of-light for the op.

Off-TPU the kernels run in interpret mode.
"""

from __future__ import annotations

import functools

import numpy as np
import jax

from . import runtime
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _power_mel_post(m, mel, post, n_fft, floor):
    """Spectrum halves -> power -> mel -> log -> post matmul, all in VMEM.
    m may be bf16 (dft_acc knob); power is always computed in f32."""
    nb = m.shape[1] // 2
    mf = m.astype(jnp.float32)
    p = (mf[:, :nb] ** 2 + mf[:, nb:] ** 2) * (1.0 / n_fft)
    mel_out = jax.lax.dot_general(
        p.astype(mel.dtype),
        mel,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    lm = jnp.log(jnp.maximum(mel_out, floor))
    return jax.lax.dot_general(
        lm.astype(post.dtype),
        post,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _spectrum_to_features(frames, wdft, mel, post, n_fft, floor):
    """Shared VMEM pipeline: frames [BF, frame_len] -> features [BF, F_out].
    Matmul inputs may be bf16 (compute_dtype knob); the MXU accumulates in
    f32 (preferred_element_type) and power/log run in f32."""
    m = jax.lax.dot_general(
        frames,
        wdft,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [BF, 2*(n_fft//2+1)] — windowed rDFT (re | im halves)
    return _power_mel_post(m, mel, post, n_fft, floor)


def _kernel(frames_ref, wdft_ref, mel_ref, post_ref, out_ref, *, n_fft, floor):
    out_ref[:] = _spectrum_to_features(
        frames_ref[:], wdft_ref[:], mel_ref[:], post_ref[:], n_fft, floor
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
        interpret = not runtime.on_tpu()
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


def _framed_kernel(
    rows_ref,  # [bf, hop] VMEM: this block's hop-rows
    next_ref,  # [bf, hop] VMEM: the NEXT block's hop-rows (frame lookahead)
    wdft_ref,
    mel_ref,
    post_ref,
    out_ref,
    *,
    n_fft,
    floor,
    bf,
    hop,
    frame_len,
    k,
    acc,
):
    # Overlapping frames without dynamic slicing: Mosaic rejects
    # dynamic-offset slices of tiled memrefs outright (round-3 campaign
    # logs, HBM or VMEM, aligned or not), so the overlap comes from the
    # GRID instead — two blocked views of the same rows array, offset by
    # one block, concatenated on the (tile-aligned) sublane dim.
    rows = jnp.concatenate([rows_ref[:], next_ref[:]], axis=0)  # [2bf, hop]
    # Frame i spans rows i..i+k-1 of the hop grid.  Rather than
    # CONCATENATING k shifted row-slices into a [bf, frame_len] frames
    # matrix (a lane-dim concatenate of non-128-aligned pieces — also
    # rejected), split the DFT contraction itself:
    #   frames @ wdft == sum_i rows[i:bf+i, :w_i] @ wdft[i*hop : i*hop+w_i]
    # k STATIC sublane-shifted slices feeding matmuls accumulated in f32
    # on the MXU; the frames matrix never exists anywhere.
    m = None
    for i in range(k):
        lo = i * hop
        width = min(hop, frame_len - lo)
        part = jax.lax.dot_general(
            rows[i : bf + i, :width],
            wdft_ref[lo : lo + width, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            # acc=bf16 halves the [bf, 2K] DFT-intermediate VMEM stage (the
            # round-3 1024-block regression blamed its f32 footprint); the
            # MXU still accumulates each partial product in f32.
            preferred_element_type=acc,
        )
        m = part if m is None else m + part
    out_ref[:] = _power_mel_post(
        m, mel_ref[:], post_ref[:], n_fft, floor
    )


def fused_frontend_framed(
    y: jnp.ndarray,  # [B, N] pre-emphasized waveform (f32 or bf16)
    max_frames: int,
    wdft: jnp.ndarray,  # [frame_len, 2*(n_fft//2+1)] window-folded rDFT basis
    mel_fb: jnp.ndarray,  # [n_fft//2+1, n_mels]
    post: jnp.ndarray,  # [n_mels, F_out]
    n_fft: int,
    floor: float,
    hop: int,
    frame_len: int,
    # 256 frames/program, measured optimum on v5e (bench_suite r3d rows):
    # 3.0 ms at batch 64.  1024-frame blocks measured WORSE (4.2 ms) —
    # the [bf, 514] f32 DFT intermediate grows to ~2 MB/stage and VMEM
    # pressure breaks the grid's double-buffering; 256 keeps the whole
    # working set small enough to pipeline, and the residual cost is
    # per-program overhead (~12 us x 256 programs), not bandwidth.
    # Round 4 sweeps 384/512 and a bf16 DFT intermediate (acc_dtype).
    block_frames: int = 256,
    acc_dtype=jnp.float32,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """[B, N] waveform -> [B, max_frames, F_out] features, one fused kernel
    including the framing itself (frame i = y[i*hop : i*hop+frame_len])."""
    if interpret is None:
        interpret = not runtime.on_tpu()
    B, N = y.shape
    F_out = post.shape[1]
    k = -(-frame_len // hop)  # rows of the hop grid a frame spans
    align = 16 if y.dtype.itemsize == 2 else 8
    bf = min(block_frames, max_frames)
    bf = max(-(-bf // align) * align, align)
    nb = -(-max_frames // bf)
    t_pad = nb * bf
    # Per-utterance row budget: nb+1 FULL blocks, so the kernel's
    # next-block view stays in bounds at the last block.
    n_need = (nb + 1) * bf * hop
    if N < n_need:
        y = jnp.pad(y, ((0, 0), (0, n_need - N)))
    rows = y[:, :n_need].reshape(B * (nb + 1) * bf, hop)

    out = pl.pallas_call(
        functools.partial(
            _framed_kernel,
            n_fft=n_fft,
            floor=floor,
            bf=bf,
            hop=hop,
            frame_len=frame_len,
            k=k,
            acc=acc_dtype,
        ),
        grid=(B, nb),
        in_specs=[
            pl.BlockSpec(  # this block's rows
                (bf, hop),
                lambda b, j, nb=nb: (b * (nb + 1) + j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(  # next block's rows (frame lookahead)
                (bf, hop),
                lambda b, j, nb=nb: (b * (nb + 1) + j + 1, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (wdft.shape[0], wdft.shape[1]),
                lambda b, j: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (mel_fb.shape[0], mel_fb.shape[1]),
                lambda b, j: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (post.shape[0], post.shape[1]),
                lambda b, j: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (bf, F_out),
            lambda b, j, nb=nb: (b * nb + j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B * t_pad, F_out), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * t_pad * frame_len * wdft.shape[1]
            + 2 * B * t_pad * mel_fb.shape[0] * mel_fb.shape[1]
            + 2 * B * t_pad * post.shape[0] * F_out,
            bytes_accessed=y.dtype.itemsize * B * n_need
            + 4 * B * t_pad * F_out,
            transcendentals=B * t_pad * mel_fb.shape[1],
        ),
    )(rows, rows, wdft, mel_fb, post)
    return out.reshape(B, t_pad, F_out)[:, :max_frames]

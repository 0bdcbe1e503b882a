"""CTCModel: front-end + encoder + vocab projection -> logits.

Assembles the full acoustic model (SURVEY.md §2 L4 equivalent): optional
Conv2d subsampling, a BiLSTM or Conformer encoder, and the final Dense to
V=29 logits.  Returns batch-major logits [B, T, V] + logit lengths — the
per-frame log-posterior oracle surface of BASELINE.json is
log_softmax(these logits).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from ..text import VOCAB_SIZE
from .bilstm import BiLSTMEncoder
from .conv_subsample import Conv2dSubsample, subsampled_len


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    encoder_type: str = "bilstm"  # "bilstm" | "conformer"
    num_layers: int = 2
    hidden: int = 256
    vocab_size: int = VOCAB_SIZE
    conv_subsample: bool = False
    conv_channels: int = 32
    conv_out_dim: int = 256
    # Conformer-only knobs:
    num_heads: int = 4
    ff_mult: int = 4
    conv_kernel: int = 15
    dropout: float = 0.0
    use_pallas_attention: bool = False
    # False drops the custom_partitioning boundary around the attention
    # kernel (single-device only; Trainer clears it on 1-device meshes).
    partition_attention: bool = True
    # Static per-program attention dispatch: bucket programs whose padded
    # frame count T is below this use plain XLA attention; at/above it the
    # Pallas blockwise kernel engages.  Measured crossover on 1x v5e
    # (BASELINE.md r3 "attention policy"): the kernel's per-grid-program
    # dispatch overhead loses ~0.9 ms/layer to XLA attention at T=240 and
    # ties from T~480; XLA's [B,H,T,T] materialization only threatens HBM
    # at multi-thousand-frame T.  0 = kernel whenever use_pallas_attention.
    pallas_attn_min_t: int = 512
    # Short-T XLA attention layout (models/conformer.py MHSA): "split" =
    # the round-4 per-tensor-transpose form; "packed" = one
    # [B,T,3,H,D]->[3,B,H,T,D] transpose for q/k/v together, rotation-
    # matmul rope, additive mask — same math, fewer layout copies.
    # "packed" is the default since round 5: measured +2.4 % step
    # throughput and +6 % beam decode at the headline point (campaign
    # r5a: 12,765 vs 12,469 audio-s/s; BASELINE.md r5).
    attn_impl: str = "packed"
    # Conformer conv module: "xla" flax chain or "pallas" fused
    # single-kernel chain (ops/pallas_conv.py; mesh-safe via batch-axis
    # custom_partitioning — weight grads psum'd).  Presets flip config 5
    # to "pallas" (measured +3 % step throughput, campaign r5a); the
    # global default stays "xla" because off-TPU the kernel runs in
    # interpret mode (tests/CPU paths pay it only where opted in).
    conv_impl: str = "xla"
    dtype: Any = jnp.float32
    # LSTM recurrence unroll: higher amortizes loop overhead but multiplies
    # XLA compile time of every (bucket) program; 8 ~ throughput plateau.
    scan_unroll: int = 8
    # Run both directions of each BiLSTM layer in ONE scan (half the
    # sequential step dispatches; identical math — models/bilstm.py
    # FusedBiLSTMLayer).  Changes the param tree, so it is a preset choice,
    # not a runtime toggle.
    bilstm_fused_scan: bool = False
    # Stack k consecutive frames ([B,T,F] -> [B,ceil(T/k),F*k]) before a
    # BiLSTM encoder: k x fewer sequential recurrence steps at the price of
    # a k x wider input matmul (Sak et al. 2015, PAPERS.md "Fast and
    # Accurate RNN Acoustic Models": frame stacking + reduced frame rate).
    # Ignored when conv_subsample already reduces the rate.
    frame_stack: int = 1

    def output_lens(self, feat_lens):
        if self.conv_subsample:
            return subsampled_len(feat_lens)
        # frame_stack only applies where CTCModel actually stacks: the
        # bilstm path without conv subsampling.
        if self.frame_stack > 1 and self.encoder_type == "bilstm":
            return (feat_lens + self.frame_stack - 1) // self.frame_stack
        return feat_lens


class CTCModel(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(
        self,
        feats: jnp.ndarray,  # [B, T, F]
        feat_lens: jnp.ndarray,  # [B]
        train: bool = False,
    ):
        cfg = self.cfg
        h, lens = feats, feat_lens
        if cfg.conv_subsample:
            h, lens = Conv2dSubsample(
                channels=cfg.conv_channels,
                out_dim=cfg.conv_out_dim,
                dtype=cfg.dtype,
                name="subsample",
            )(h, lens)
        if cfg.encoder_type == "bilstm":
            if cfg.frame_stack > 1 and not cfg.conv_subsample:
                k = cfg.frame_stack
                B, T, F = h.shape
                pad = (-T) % k
                if pad:
                    h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
                h = h.reshape(B, (T + pad) // k, F * k)
                lens = (lens + k - 1) // k
            h = BiLSTMEncoder(
                num_layers=cfg.num_layers,
                hidden=cfg.hidden,
                dtype=cfg.dtype,
                scan_unroll=cfg.scan_unroll,
                fused_scan=cfg.bilstm_fused_scan,
                name="encoder",
            )(h, lens)
        elif cfg.encoder_type == "conformer":
            from .conformer import ConformerEncoder

            h = ConformerEncoder(
                num_layers=cfg.num_layers,
                dim=cfg.hidden,
                num_heads=cfg.num_heads,
                ff_mult=cfg.ff_mult,
                conv_kernel=cfg.conv_kernel,
                dropout=cfg.dropout,
                use_pallas_attention=cfg.use_pallas_attention,
                partition_attention=cfg.partition_attention,
                attn_min_t=cfg.pallas_attn_min_t,
                attn_impl=cfg.attn_impl,
                conv_impl=cfg.conv_impl,
                dtype=cfg.dtype,
                name="encoder",
            )(h, lens, train=train)
        else:
            raise ValueError(f"unknown encoder_type {cfg.encoder_type!r}")

        logits = nn.Dense(
            cfg.vocab_size,
            dtype=jnp.float32,  # logits in f32 for a stable CTC loss
            name="output",
        )(h.astype(jnp.float32))
        return logits, lens

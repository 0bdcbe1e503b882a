"""Typed config presets — one per BASELINE.json graded config (SURVEY.md §1).

The reference's config surface is argparse flags / ini (SURVEY.md §6); here
every run is a frozen dataclass serialized into checkpoints and metrics
logs for reproducibility.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional

from .features.frontend import FeatureConfig
from .models.encoder import ModelConfig


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    name: str
    model: ModelConfig
    features: FeatureConfig
    # data
    corpus: str = "synthetic"  # "synthetic" | path to LibriSpeech root
    corpus_split: str = "dev-clean"
    num_utterances: int = 512  # synthetic corpus size
    # Synthetic-corpus char duration. Configs with 4x conv subsampling get
    # 120 ms (3 encoder frames per char) — at the default 80 ms every
    # utterance sits at the CTC feasibility edge (T' ~ 2L+1), which stalls
    # training on redundancy-free random text.
    synth_char_ms: float = 80.0
    batch_size: int = 16  # largest bucket's batch size
    seed: int = 0
    # optimization
    lr: float = 3e-4
    warmup_steps: int = 100
    epochs: int = 10
    grad_clip: float = 5.0
    weight_decay: float = 0.0
    # augmentation (config 3+)
    specaugment: bool = False
    freq_mask: int = 10
    time_mask: int = 20
    num_freq_masks: int = 1
    num_time_masks: int = 2
    # Time-mask fill scale: 1.0 = unit-Gaussian noise (default; see
    # augment/specaugment.py — exact zeros overflow deep-stack grads),
    # 0.0 = classic zero fill.
    time_mask_noise: float = 1.0
    # decoding
    beam_width: int = 16
    lm_order: int = 0  # 0 = no shallow fusion
    lm_weight: float = 0.0
    # evaluation protocol (de-saturated WER ladder — a gate needs a signal;
    # VERDICT.md round-1 item 4). 0/None = neutral: eval split mirrors the
    # train distribution. Presets 2-5 set a harder protocol: more held-out
    # utterances, a raised noise floor, and a constant formant shift never
    # seen in training, so greedy/beam/beam+LM rank as distinct numbers.
    eval_utts: int = 0  # 0 -> max(num_utterances // 8, 16)
    eval_noise_level: Optional[float] = None  # None -> train noise (0.05)
    eval_formant_shift_hz: float = 0.0
    # Default blank-collapse threshold for beam-search EVALUATION (arXiv
    # 2210.17017 frame compression; None = off).  MEASURED DECISION
    # (round-5 ladder, paired collapse evals on every config): the 0.999
    # crop is NOT WER-neutral on this stack — conformer +3.6 pp std /
    # +3.3 pp stress, base +2.1 pp std (conv/fusion within CI) — so no
    # preset turns it on; the 28.4 ms beam-16 crop row is recorded as a
    # latency/WER TRADE-OFF, not free speed (BASELINE.md r5 ladder).
    # evaluate.py --blank-collapse / --no-blank-collapse override.
    eval_blank_collapse: Optional[float] = None
    # CTC loss implementation: "scan" (XLA lax.scan recursions) or "pallas"
    # (single-kernel VMEM-resident recursions, ops/pallas_ctc.py) — same
    # numbers, benched on TPU in tools/bench_suite.py.
    ctc_impl: str = "scan"
    # corpus cache: "auto" packs synthetic corpora >= 2048 utts to disk once
    # (int16 shards, mmap reads thereafter — epochs stop re-synthesizing
    # formants); "" disables; any other string is the cache directory.
    cache_dir: str = "auto"
    # distribution
    model_axis: int = 1  # >1 shards the encoder over the 'model' mesh axis
    # io
    ckpt_every: int = 200
    log_every: int = 10

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), default=str, indent=2)


def _feat_mfcc():
    return FeatureConfig(feature_type="mfcc", n_mels=26, n_mfcc=13)


def _feat_logmel():
    return FeatureConfig(feature_type="logmel", n_mels=80)


PRESETS: dict[str, TrainConfig] = {}


def _register(cfg: TrainConfig) -> TrainConfig:
    PRESETS[cfg.name] = cfg
    return cfg


# Config 1 — tiny 2-layer BiLSTM-CTC (256), MFCC, greedy, CPU-runnable.
CONFIG1 = _register(
    TrainConfig(
        name="tiny",
        model=ModelConfig(encoder_type="bilstm", num_layers=2, hidden=256),
        features=_feat_mfcc(),
        num_utterances=256,
        batch_size=16,
        epochs=30,
        lr=1e-3,
        beam_width=1,
    )
)

# Config 2 — 4-layer BiLSTM-CTC (512), log-mel-80, beam width 16.
# Frame stacking k=3 (Sak et al. 2015) is the DEFAULT since round 5
# (VERDICT r4 item 7): it dominated the unstacked form on BOTH axes for
# two rounds (r3: 3.53 % < 5.70 % beam WER AND ~3x train throughput;
# 3 stacked frames widen the recurrence's receptive field), and the r4
# fresh ladder re-based every gate anyway, spending the last
# "comparability with the recorded base ladder" argument.  The unstacked
# geometry remains as `base_fs1` for the record; the config-2 gate is
# re-derived from a fresh fs3 run (tools/run_ladder.py).
CONFIG2 = _register(
    TrainConfig(
        name="base",
        model=ModelConfig(
            encoder_type="bilstm", num_layers=4, hidden=512, frame_stack=3
        ),
        features=_feat_logmel(),
        num_utterances=2048,
        batch_size=32,
        epochs=20,
        beam_width=16,
        eval_utts=512,
        eval_noise_level=0.25,
        eval_formant_shift_hz=15.0,
    )
)

# Round-3/4 unstacked geometry, kept for comparisons with the recorded
# base ladder numbers (param shapes differ from `base`).
CONFIG2_FS1 = _register(
    dataclasses.replace(
        CONFIG2,
        name="base_fs1",
        model=dataclasses.replace(CONFIG2.model, frame_stack=1),
    )
)

# Back-compat alias: `base_fs3` (the rounds-3/4 preset name) is now the
# same geometry as `base`.
CONFIG2_FS3 = _register(dataclasses.replace(CONFIG2, name="base_fs3"))

# Config 3 — Conv2d subsample + 5-layer BiLSTM, SpecAugment, bucketing.
CONFIG3 = _register(
    TrainConfig(
        name="conv",
        model=ModelConfig(
            encoder_type="bilstm",
            num_layers=5,
            hidden=512,
            conv_subsample=True,
            conv_out_dim=512,
        ),
        features=_feat_logmel(),
        synth_char_ms=120.0,
        num_utterances=4096,
        batch_size=32,
        epochs=20,
        specaugment=True,
        beam_width=16,
        eval_utts=512,
        eval_noise_level=0.25,
        eval_formant_shift_hz=15.0,
    )
)

# Config 4 — 6-layer BiLSTM + n-gram LM shallow fusion, multi-host DP.
CONFIG4 = _register(
    TrainConfig(
        name="fusion",
        model=ModelConfig(
            encoder_type="bilstm",
            num_layers=6,
            hidden=512,
            conv_subsample=True,
            conv_out_dim=512,
        ),
        features=_feat_logmel(),
        synth_char_ms=120.0,
        num_utterances=8192,
        batch_size=32,
        epochs=20,
        specaugment=True,
        beam_width=16,
        lm_order=3,
        lm_weight=0.5,
        eval_utts=512,
        eval_noise_level=0.25,
        eval_formant_shift_hz=15.0,
    )
)

# Config 5 — Conformer-CTC 12 blocks ~30M params, Pallas attention,
# sharded encoder.
CONFIG5 = _register(
    TrainConfig(
        name="conformer",
        model=ModelConfig(
            encoder_type="conformer",
            num_layers=12,
            hidden=384,
            num_heads=6,
            ff_mult=4,
            conv_kernel=15,
            conv_subsample=True,
            conv_out_dim=384,
            use_pallas_attention=True,
            # Fused Pallas conv module (ops/pallas_conv.py): measured +3 %
            # step throughput over the XLA chain at the headline point
            # (campaign r5a, BASELINE.md r5), mesh-safe via batch-axis
            # custom_partitioning.  attn_impl="packed" is the ModelConfig
            # default since round 5.
            conv_impl="pallas",
        ),
        features=_feat_logmel(),
        synth_char_ms=120.0,
        num_utterances=8192,
        batch_size=32,
        epochs=20,
        specaugment=True,
        beam_width=16,
        eval_utts=512,
        eval_noise_level=0.25,
        eval_formant_shift_hz=15.0,
        # Zero-dispatch streaming CTC kernels (round 4): fastest measured
        # impl (0.70 vs scan 1.09 ms fwd+bwd at the headline shape) and
        # mesh-safe via batch-axis custom_partitioning
        # (tests/distributed_checks.py::check_ctc_stream_under_mesh).
        ctc_impl="pallas_stream",
        model_axis=1,  # raised on pods whose encoder exceeds one chip's HBM
    )
)

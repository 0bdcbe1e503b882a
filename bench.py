"""Benchmark: audio-seconds/s per chip (BASELINE.json primary metric).

Runs the flagship Conformer-CTC training step and greedy-decode step on the
default backend (the real TPU chip under axon; CPU if forced), measures
steady-state step time, and prints ONE JSON line:

  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

vs_baseline: the reference publishes no benchmark numbers
(BASELINE.json "published": {}), so the standing baseline is this repo's
first recorded value (BASELINE.md); until one exists vs_baseline is 1.0.
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time

import numpy as np


# First recorded value (round 1, conformer12x384, batch 4, f32, 1x v5e):
# 276.64 audio_s/s train / 6828.95 decode. vs_baseline is measured against
# this standing number.
BASELINE_AUDIO_S_PER_S = 276.64


def main() -> None:
    import argparse

    import jax
    import jax.numpy as jnp

    from neuralasr_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    from neuralasr_tpu.configs import CONFIG5
    from neuralasr_tpu.training import Trainer
    from neuralasr_tpu.data.buckets import BucketSpec

    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32, help="bench batch size")
    p.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    p.add_argument("--pallas-frontend", action="store_true", default=True)
    p.add_argument("--no-pallas-frontend", dest="pallas_frontend",
                   action="store_false")
    p.add_argument("--pallas-attention", action="store_true", default=None)
    p.add_argument("--no-pallas-attention", dest="pallas_attention",
                   action="store_false")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--model", default="conformer12x384",
                   choices=["conformer12x384", "bilstm4x512"],
                   help="flagship Conformer (config 5) or the config-2 BiLSTM")
    p.add_argument("--scan-unroll", type=int, default=None,
                   help="override LSTM scan unroll (bilstm model only)")
    args = p.parse_args()

    on_tpu = jax.default_backend() == "tpu"
    use_pallas_attn = (
        args.pallas_attention if args.pallas_attention is not None else on_tpu
    )
    if args.model == "bilstm4x512":
        from neuralasr_tpu.configs import CONFIG2

        base = CONFIG2
        model_over = dict(
            dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
        )
        if args.scan_unroll is not None:
            model_over["scan_unroll"] = args.scan_unroll
    else:
        base = CONFIG5
        model_over = dict(
            use_pallas_attention=use_pallas_attn,
            dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
        )
    cfg = dataclasses.replace(
        base,
        num_utterances=64,
        batch_size=args.batch * 4,  # bucket ladder halves bs twice by 9.5 s
        specaugment=True,
        features=dataclasses.replace(
            base.features, use_pallas=args.pallas_frontend and on_tpu
        ),
        model=dataclasses.replace(base.model, **model_over),
    )
    trainer = Trainer(cfg)
    sr = cfg.features.sample_rate

    # Fixed synthetic batch in the 8 s bucket (index by max_samples).
    bucket = next(
        i for i, b in enumerate(trainer.buckets) if b.max_samples >= 8 * sr
    )
    spec = trainer.buckets[bucket]
    rng = np.random.default_rng(0)
    B = spec.batch_size
    wav = (rng.normal(size=(B, spec.max_samples)) * 1000).astype(np.int16)
    wav_lens = np.full((B,), spec.max_samples, np.int32)
    labels = rng.integers(1, 29, size=(B, spec.max_label_len)).astype(np.int32)
    label_lens = np.full((B,), spec.max_label_len, np.int32)
    weights = np.ones((B,), np.float32)

    from neuralasr_tpu.data.loader import Batch

    batch = Batch(wav, wav_lens, labels, label_lens, weights, bucket, 0, 0)

    # Warmup (compile), then steady-state compute throughput on
    # device-resident args — per-chip compute is the BASELINE metric; a real
    # host keeps the device fed by prefetch (the axon tunnel's H2D bandwidth
    # is not representative hardware, so it is reported separately below).
    trainer.train_batch(batch)
    jax.block_until_ready(trainer.state["params"])
    dev_args = trainer.put_batch(batch)
    trainer.train_batch_device(bucket, dev_args)
    jax.block_until_ready(trainer.state["params"])
    t0 = time.time()
    iters = args.iters
    for _ in range(iters):
        trainer.train_batch_device(bucket, dev_args)
    jax.block_until_ready(trainer.state["params"])
    dt = (time.time() - t0) / iters

    audio_s = float(wav_lens.sum()) / sr
    train_tp = audio_s / dt

    # Pipeline throughput including per-step H2D transfer (async dispatch,
    # no per-step host sync).
    t0 = time.time()
    for _ in range(iters):
        trainer.train_batch(batch)
    jax.block_until_ready(trainer.state["params"])
    pipeline_tp = audio_s / ((time.time() - t0) / iters)

    # Decode throughput (greedy, jit'd fwd+decode).
    from neuralasr_tpu.ctc.greedy import greedy_decode

    frontend = trainer._frontend_for(bucket)

    @jax.jit
    def decode_step(params, wav, wav_lens):
        feats, feat_lens = frontend(wav, wav_lens)
        logits, out_lens = trainer.model.apply(
            {"params": params}, feats, feat_lens, train=False
        )
        return greedy_decode(logits, out_lens)

    wj, wl = jnp.asarray(wav), jnp.asarray(wav_lens)
    jax.block_until_ready(decode_step(trainer.state["params"], wj, wl))
    t0 = time.time()
    for _ in range(iters):
        out = decode_step(trainer.state["params"], wj, wl)
    jax.block_until_ready(out)
    decode_tp = audio_s / ((time.time() - t0) / iters)

    # Beam-search decode throughput (width 16, blank-collapse compression —
    # the full on-device vectorized prefix beam of ctc/beam.py).
    from neuralasr_tpu.ctc.beam import beam_search_decode, blank_collapse

    max_label = int(labels.shape[1]) + 8

    @jax.jit
    def beam_step(params, wav, wav_lens):
        feats, feat_lens = frontend(wav, wav_lens)
        logits, out_lens = trainer.model.apply(
            {"params": params}, feats, feat_lens, train=False
        )
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        lp_c, lens_c = blank_collapse(lp, out_lens, threshold=0.999)
        return beam_search_decode(
            lp_c, lens_c, beam_width=16, max_label_len=max_label
        )

    jax.block_until_ready(beam_step(trainer.state["params"], wj, wl))
    t0 = time.time()
    for _ in range(iters):
        out = beam_step(trainer.state["params"], wj, wl)
    jax.block_until_ready(out)
    beam_tp = audio_s / ((time.time() - t0) / iters)

    # Primary metric: train+decode combined (harmonic-ish: report train; the
    # decode number rides along in the same line for the record).
    value = round(train_tp, 2)
    vs = 1.0 if BASELINE_AUDIO_S_PER_S is None else round(
        value / BASELINE_AUDIO_S_PER_S, 3
    )
    print(
        json.dumps(
            {
                "metric": "train_audio_s_per_s_per_chip",
                "value": value,
                "unit": "audio_s/s",
                "vs_baseline": vs,
                "decode_audio_s_per_s_per_chip": round(decode_tp, 2),
                "beam16_audio_s_per_s_per_chip": round(beam_tp, 2),
                "pipeline_audio_s_per_s_incl_h2d": round(pipeline_tp, 2),
                "backend": jax.default_backend(),
                "model": args.model,
                "batch": B,
                "bucket_audio_s": audio_s / B,
            }
        )
    )


if __name__ == "__main__":
    main()

"""Benchmark: audio-seconds/s per chip (BASELINE.json primary metric).

Runs the flagship Conformer-CTC training step and greedy/beam decode steps
on the default backend (the real TPU chip under axon; CPU if forced),
measures steady-state step time, and prints ONE JSON line:

  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

vs_baseline: the reference publishes no benchmark numbers
(BASELINE.json "published": {}), so the standing baseline is this repo's
first recorded value (BASELINE.md); until one exists vs_baseline is 1.0.

Speed-of-light accounting (VERDICT.md round-1 item 7): the line also
carries `mfu` (model FLOPs utilization of the train step against the
chip's peak matmul throughput, from XLA's own cost analysis of the
compiled program) and a per-stage breakdown (frontend / encoder forward /
loss+backward / optimizer / greedy / beam) with achieved FLOP/s and
bytes/s per stage, so "at speed-of-light" is a measured claim.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time

import numpy as np


# First recorded value (round 1, conformer12x384, batch 4, f32, 1x v5e):
# 276.64 audio_s/s train / 6828.95 decode. vs_baseline is measured against
# this standing number.
BASELINE_AUDIO_S_PER_S = 276.64


def _peak_flops_per_s(device) -> float | None:
    """Peak dense-matmul FLOP/s for the chip (bf16 path; the bench's
    default dtype).  Public numbers; None when unknown (e.g. CPU)."""
    kind = getattr(device, "device_kind", "").lower()
    if "v5 lite" in kind or "v5e" in kind or "v5lite" in kind:
        return 197e12
    if "v5p" in kind or "v5" in kind:
        return 459e12
    if "v4" in kind:
        return 275e12
    if "v6" in kind or "trillium" in kind:
        return 918e12
    return None


def _fetch_sync(out, block):
    """Force a REAL device fence: `block_until_ready` does not fence on
    the axon backend (BASELINE.md measurement notes) — r2-r4 decode
    readings swung +-20% across sessions from it.  device_get the
    SMALLEST leaf (a loss/lens scalar) — a pure transfer, no jnp ops
    (an indexing op would trigger a remote compile INSIDE the timed
    region, which inflated a first r4 attempt by ~80 ms/iter)."""
    import jax

    leaves = [
        x for x in jax.tree_util.tree_leaves(out)
        if hasattr(x, "size") and getattr(x, "size", 0)
    ]
    if leaves:
        jax.device_get(min(leaves, key=lambda x: x.size))
    else:
        block(out)


def _timeit(fn, iters: int, block) -> float:
    """Steady-state seconds/iter (fn must be warmed up)."""
    # Pre-sync: drain the dispatch queue so the timer starts clean.
    _fetch_sync(fn(), block)
    t0 = time.time()
    out = None
    for _ in range(iters):
        out = fn()
    _fetch_sync(out, block)
    return (time.time() - t0) / iters


def _cost(compiled) -> tuple[float | None, float | None]:
    """(flops, bytes_accessed) from XLA's cost analysis, if available."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) or None, (
            float(ca.get("bytes accessed", 0.0)) or None
        )
    except Exception:
        return None, None


def main() -> None:
    import argparse

    import jax
    import jax.numpy as jnp

    from neuralasr_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    from neuralasr_tpu.configs import CONFIG5
    from neuralasr_tpu.training import Trainer

    p = argparse.ArgumentParser()
    # Default 64: +0.035 mfu over 32 on the v5e (BASELINE.md round-2 A/B);
    # VERDICT r2 item 2c promoted it to the standard bench point.
    p.add_argument("--batch", type=int, default=64, help="bench batch size")
    p.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    p.add_argument("--frontend", default="pallas",
                   choices=["pallas", "gather", "conv"],
                   help="frontend implementation: fused Pallas kernel, "
                        "gather+DFT-matmul, or strided-conv DFT")
    p.add_argument("--pallas-attention", action="store_true", default=None)
    p.add_argument("--no-pallas-attention", dest="pallas_attention",
                   action="store_false")
    p.add_argument("--attn-min-t", type=int, default=None,
                   help="static attention dispatch threshold "
                        "(ModelConfig.pallas_attn_min_t): programs with "
                        "padded T below this use XLA attention, at/above "
                        "it the Pallas kernel; 0 forces the kernel "
                        "everywhere (the pre-r3 behavior). Default: the "
                        "config's measured 512.")
    p.add_argument("--attn-impl", default=None, choices=["split", "packed"],
                   help="short-T XLA attention layout: 'split' (r4 form, "
                        "per-tensor transposes) or 'packed' (one "
                        "[3,B,H,T,D] transpose, rotation-matmul rope, "
                        "additive mask — same math, fewer layout copies)")
    p.add_argument("--conv-impl", default=None, choices=["xla", "pallas"],
                   help="conformer conv module: flax XLA chain or the "
                        "fused single-kernel chain (ops/pallas_conv.py)")
    p.add_argument("--partition-attention", action="store_true",
                   help="force the custom_partitioning wrapper even on one "
                        "device (A/B the partitioning boundary's cost)")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--model", default="conformer12x384",
                   choices=["conformer12x384", "bilstm4x512"],
                   help="flagship Conformer (config 5) or the config-2 BiLSTM")
    p.add_argument("--scan-unroll", type=int, default=None,
                   help="override LSTM scan unroll (bilstm model only)")
    p.add_argument("--frame-stack", type=int, default=None,
                   help="stack k frames before the BiLSTM (k x fewer "
                        "recurrence steps; bilstm model only)")
    p.add_argument("--fused-scan", action="store_true",
                   help="fwd+bwd directions in one scan per BiLSTM layer "
                        "(half the sequential dispatches; bilstm only)")
    p.add_argument("--ctc-impl", default="pallas_stream",
                   choices=["scan", "pallas", "pallas_stream"],
                   help="CTC recursions: XLA scan, per-frame-grid Pallas "
                        "kernels, or the zero-dispatch streaming kernels "
                        "(default; fastest measured: 0.70 vs scan 1.09 ms "
                        "fwd+bwd at the headline shape, ctc_micro_r4; "
                        "mesh-safe via batch-axis custom_partitioning).")
    p.add_argument("--beam-width", type=int, default=16)
    p.add_argument("--beam-prune-k", type=int, default=0,
                   help="per-frame top-K extension pre-prune for the beam "
                        "(0=off, -1=auto min(V, W+2) — exact without LM; "
                        "ctc/beam.py::_beam_step_pruned)")
    p.add_argument("--frontend-block", type=int, default=None,
                   help="frames per framed-Pallas-frontend grid program "
                        "(FeatureConfig.pallas_block_frames; default 256)")
    p.add_argument("--frontend-acc", default=None,
                   choices=["float32", "bfloat16"],
                   help="framed-frontend DFT-intermediate dtype "
                        "(FeatureConfig.pallas_dft_acc)")
    p.add_argument("--beam-merge", default="allpairs",
                   choices=["allpairs", "sort"],
                   help="duplicate-prefix merge: all-pairs match tensor "
                        "(vector-shaped; 12-13x faster on TPU at W=16..64) "
                        "vs sorted hash search")
    p.add_argument("--breakdown", action="store_true", default=True,
                   help="per-stage roofline breakdown (default on)")
    p.add_argument("--no-breakdown", dest="breakdown", action="store_false")
    p.add_argument("--ckpt", default=None, metavar="WORKDIR",
                   help="restore params from WORKDIR/ckpt and bench decode "
                        "on REAL synthetic-speech emissions — the measured "
                        "(non-simulated) blank-collapse numbers "
                        "(VERDICT r2 item 9)")
    p.add_argument("--preflight", action="store_true",
                   help="compile + parity-check every Pallas kernel family "
                        "on the live backend (attention fwd/bwd plan edges, "
                        "streaming/grid CTC lane-pad edge, frontend blocks) "
                        "and exit; writes --preflight-out and prints one "
                        "JSON line (utils/preflight.py; VERDICT r4 item 6)")
    p.add_argument("--preflight-out", default="runs/preflight_r5.json")
    args = p.parse_args()

    if args.preflight:
        from neuralasr_tpu.utils.preflight import run_preflight

        res = run_preflight()
        os.makedirs(os.path.dirname(args.preflight_out) or ".", exist_ok=True)
        with open(args.preflight_out, "w") as f:
            json.dump(res, f, indent=1)
        print(json.dumps({
            "metric": "preflight_all_ok",
            "value": 1 if res["all_ok"] else 0,
            "unit": "bool",
            "vs_baseline": 1.0,
            "backend": res["backend"],
            "out": args.preflight_out,
        }))
        return

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
        if args.frame_stack is not None:
            model_over["frame_stack"] = args.frame_stack
        if args.fused_scan:
            model_over["bilstm_fused_scan"] = True
    else:
        base = CONFIG5
        model_over = dict(
            use_pallas_attention=use_pallas_attn,
            dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
        )
        if args.attn_min_t is not None:
            model_over["pallas_attn_min_t"] = args.attn_min_t
        if args.attn_impl is not None:
            model_over["attn_impl"] = args.attn_impl
        if args.conv_impl is not None:
            model_over["conv_impl"] = args.conv_impl
    cfg = dataclasses.replace(
        base,
        num_utterances=64,
        batch_size=args.batch * 4,  # bucket ladder halves bs twice by 9.5 s
        specaugment=True,
        cache_dir="",
        ctc_impl=args.ctc_impl,
        features=dataclasses.replace(
            base.features,
            use_pallas=args.frontend == "pallas" and on_tpu,
            frontend_impl="conv" if args.frontend == "conv" else "gather",
            # Frontend compute follows the bench dtype: bf16 halves the
            # framing/DFT HBM traffic (VERDICT r2 item 2a; parity bounds in
            # tests/test_features.py::test_bf16_compute_dtype_parity).
            compute_dtype=args.dtype,
            **(
                {"pallas_block_frames": args.frontend_block}
                if args.frontend_block is not None
                else {}
            ),
            **(
                {"pallas_dft_acc": args.frontend_acc}
                if args.frontend_acc is not None
                else {}
            ),
        ),
        model=dataclasses.replace(base.model, **model_over),
    )
    if args.partition_attention:
        # A/B the custom_partitioning boundary on one device: force the
        # flag in the config and tell the Trainer to skip its
        # single-device downgrade (ADVICE r2: no post-construction
        # cfg/model mutation).
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(cfg.model, partition_attention=True),
        )
    trainer = Trainer(cfg, keep_partition_attention=args.partition_attention)
    sr = cfg.features.sample_rate

    # Fixed synthetic batch in the 8 s bucket (index by max_samples).
    bucket = next(
        i for i, b in enumerate(trainer.buckets) if b.max_samples >= 8 * sr
    )
    spec = trainer.buckets[bucket]
    rng = np.random.default_rng(0)
    B = spec.batch_size

    def _real_batch():
        # Real synthetic-speech utterances sized for this bucket, so a
        # restored checkpoint emits its true (blank-dominated) posterior
        # statistics for the measured blank-collapse rows below.
        from neuralasr_tpu.data.synthetic import SyntheticCorpus
        from neuralasr_tpu.text import encode

        sc = SyntheticCorpus(
            B, seed=123, min_words=9, max_words=12,
            char_dur_ms=cfg.synth_char_ms,
        )
        wav = np.zeros((B, spec.max_samples), np.int16)
        wav_lens = np.zeros((B,), np.int32)
        labels = np.zeros((B, spec.max_label_len), np.int32)
        label_lens = np.zeros((B,), np.int32)
        for r in range(B):
            w = sc.waveform(r)[: spec.max_samples]
            wav[r, : len(w)] = np.clip(
                np.rint(w), -32768, 32767
            ).astype(np.int16)
            wav_lens[r] = len(w)
            lab = encode(sc.transcript(r))[: spec.max_label_len]
            labels[r, : len(lab)] = lab
            label_lens[r] = len(lab)
        return wav, wav_lens, labels, label_lens

    def _restore_state(path):
        from neuralasr_tpu.utils.checkpoint import (
            Checkpointer, abstract_like,
        )

        ck = Checkpointer(os.path.join(path, "ckpt"))
        state, meta = ck.restore(abstract_like(trainer.state))
        ck.close()
        return state, meta

    if args.ckpt:
        wav, wav_lens, labels, label_lens = _real_batch()
        weights = np.ones((B,), np.float32)
        state, meta = _restore_state(args.ckpt)
        if state is None:
            raise SystemExit(f"no checkpoint under {args.ckpt}/ckpt")
        trainer.state = state
        print(f"[bench] restored step {meta['step']} from {args.ckpt}",
              flush=True)
    else:
        wav = (rng.normal(size=(B, spec.max_samples)) * 1000).astype(np.int16)
        wav_lens = np.full((B,), spec.max_samples, np.int32)
        labels = rng.integers(1, 29, size=(B, spec.max_label_len)).astype(
            np.int32
        )
        label_lens = np.full((B,), spec.max_label_len, np.int32)
        weights = np.ones((B,), np.float32)

    from neuralasr_tpu.data.loader import Batch

    batch = Batch(wav, wav_lens, labels, label_lens, weights, bucket, 0, 0)

    # Warmup (compile), then steady-state compute throughput on
    # device-resident args — per-chip compute is the BASELINE metric; the
    # prefetched-pipeline number below shows what the host adds.
    trainer.train_batch(batch)
    jax.block_until_ready(trainer.state["params"])
    dev_args = trainer.put_batch(batch)
    trainer.train_batch_device(bucket, dev_args)
    jax.block_until_ready(trainer.state["params"])
    iters = args.iters
    dt = _timeit(
        lambda: trainer.train_batch_device(bucket, dev_args),
        iters,
        lambda _: jax.block_until_ready(trainer.state["params"]),
    )

    audio_s = float(wav_lens.sum()) / sr
    train_tp = audio_s / dt

    # MFU: XLA's own FLOP count for the compiled train step / peak.
    step_fn = trainer._step_for(bucket)
    rng_step = jax.random.PRNGKey(0)
    train_flops = train_bytes = None
    try:
        compiled = step_fn.lower(trainer.state, rng_step, *dev_args).compile()
        train_flops, train_bytes = _cost(compiled)
    except Exception:
        pass
    peak = _peak_flops_per_s(jax.devices()[0])
    mfu = (
        round(train_flops / dt / peak, 4)
        if (train_flops and peak)
        else None
    )

    # Pipeline throughput: host materialize + H2D overlapped with compute
    # via the background prefetcher (the real train-loop configuration).
    from neuralasr_tpu.data.prefetch import DevicePrefetcher

    prefetch = DevicePrefetcher(
        (batch for _ in range(iters)), trainer.put_batch, depth=2
    )
    t0 = time.time()
    for b, dargs in prefetch:
        trainer.train_batch_device(b.bucket, dargs)
    jax.block_until_ready(trainer.state["params"])
    pipeline_tp = audio_s / ((time.time() - t0) / iters)

    # Host-side batch ASSEMBLY throughput with no device transfer at all
    # (VERDICT r4 item 4): the prefetched-pipeline number above is bounded
    # by the axon tunnel's ~45 MB/s H2D, which says nothing about whether
    # a real host could feed the chip.  This drives the production path —
    # mmap'd int16 packed shards through the real BucketedLoader — and
    # reports the implied H2D bandwidth needed to sustain the device rate.
    from neuralasr_tpu.data import BucketedLoader
    from neuralasr_tpu.training import make_corpus

    feed_cfg = dataclasses.replace(cfg, num_utterances=2048,
                                   cache_dir="auto")
    feed_loader = BucketedLoader(
        make_corpus(feed_cfg), trainer.buckets, seed=cfg.seed
    )
    h_audio = h_bytes = 0.0
    nb = 0
    t0 = None
    for ep in range(64):
        for b in feed_loader.epoch(ep):
            nb += 1
            if nb == 21:  # warm page cache / allocator before timing
                t0 = time.time()
            if nb > 20:
                h_audio += float(b.wav_lens.sum()) / sr
                h_bytes += b.wav.nbytes + b.labels.nbytes
        if nb > 220:
            break
    host_dt = max(time.time() - t0, 1e-9) if t0 else float("inf")
    host_assembly_tp = h_audio / host_dt
    bytes_per_audio_s = h_bytes / max(h_audio, 1e-9)
    h2d_needed_gbs = bytes_per_audio_s * train_tp / 1e9

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
    dt_g = _timeit(
        lambda: decode_step(trainer.state["params"], wj, wl),
        iters,
        jax.block_until_ready,
    )
    decode_tp = audio_s / dt_g

    # Beam-search decode throughput (width 16): blank-collapse compresses
    # frames, then the compacted array is CROPPED to a static bucketed
    # length so the beam scan actually runs fewer steps (round 1 fed the
    # full-length array and left the speedup on the table — VERDICT.md
    # round-1 weak #7).  The crop length must be data-independent for jit:
    # it is measured once from this bench batch and baked into the program,
    # exactly like evaluate.py's per-batch static crop.
    from neuralasr_tpu.ctc.beam import beam_search_decode, blank_collapse

    max_label = int(labels.shape[1]) + 8

    @jax.jit
    def posteriors(params, wav, wav_lens):
        feats, feat_lens = frontend(wav, wav_lens)
        logits, out_lens = trainer.model.apply(
            {"params": params}, feats, feat_lens, train=False
        )
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return blank_collapse(lp, out_lens, threshold=0.999)

    lp_c, lens_c = posteriors(trainer.state["params"], wj, wl)
    T_c = int(
        min(
            lp_c.shape[1],
            max(64, -(-int(np.max(np.asarray(lens_c))) // 64) * 64),
        )
    )

    @jax.jit
    def beam_step(params, wav, wav_lens):
        lp, lens = posteriors(params, wav, wav_lens)
        return beam_search_decode(
            lp[:, :T_c], lens, beam_width=args.beam_width,
            max_label_len=max_label, merge_impl=args.beam_merge,
            prune_k=args.beam_prune_k,
        )

    jax.block_until_ready(beam_step(trainer.state["params"], wj, wl))
    dt_b = _timeit(
        lambda: beam_step(trainer.state["params"], wj, wl),
        iters,
        jax.block_until_ready,
    )
    beam_tp = audio_s / dt_b

    # Blank-collapse throughput.  With --ckpt the emissions are REAL (a
    # trained checkpoint on real synthetic speech): the measured numbers at
    # thresholds 0.999 and 0.9999 replace round-2's simulated figure
    # (VERDICT r2 item 9).  Without a checkpoint the model is untrained
    # (near-uniform posteriors, nothing collapses), so trained-regime
    # statistics (75% high-blank frames) are SIMULATED via a logit boost —
    # reported under an explicitly "simulated" key.
    collapsed_rows = {}
    lp_once, lens_once = posteriors(trainer.state["params"], wj, wl)
    T_full = lp_once.shape[1]
    if args.ckpt:
        thresholds = [(0.999, "999"), (0.9999, "9999")]
    else:
        # Untrained emissions collapse nothing real, so the headline run
        # measures the collapse rows on the newest flagship checkpoint's
        # REAL emissions inline (VERDICT r4 weak 8: r4 pointed at a
        # bench_suite row instead of carrying a number).  The rows are
        # flagged non-comparable to the synthetic full-length rows above
        # (real utterances are shorter).
        thresholds = []
        auto = next(
            (
                p for p in ("runs/conformer_r5", "runs/conformer_r4")
                if os.path.isdir(os.path.join(p, "ckpt"))
            ),
            None,
        )
        if auto:
            state_c, meta_c = _restore_state(auto)
        else:
            state_c = None
        if state_c is not None:
            params_c = state_c["params"]
            wav_r, wav_lens_r, labels_r, _ = _real_batch()
            wjr, wlr = jnp.asarray(wav_r), jnp.asarray(wav_lens_r)
            audio_s_r = float(wav_lens_r.sum()) / sr
            for thresh, tag in ((0.999, "999"),):

                @jax.jit
                def coll_post(params, wav, wav_lens, _th=thresh):
                    feats, feat_lens = frontend(wav, wav_lens)
                    logits, out_lens = trainer.model.apply(
                        {"params": params}, feats, feat_lens, train=False
                    )
                    lp = jax.nn.log_softmax(
                        logits.astype(jnp.float32), axis=-1
                    )
                    return blank_collapse(lp, out_lens, threshold=_th)

                lp_cr, lens_cr = coll_post(params_c, wjr, wlr)
                T_cr = int(
                    min(
                        lp_cr.shape[1],
                        max(
                            64,
                            -(-int(np.max(np.asarray(lens_cr))) // 64) * 64,
                        ),
                    )
                )

                @jax.jit
                def beam_coll(params, wav, wav_lens, _th=thresh, _T=T_cr):
                    lp, lens = coll_post(params, wav, wav_lens, _th)
                    return beam_search_decode(
                        lp[:, :_T], lens, beam_width=args.beam_width,
                        max_label_len=max_label,
                        merge_impl=args.beam_merge,
                        prune_k=args.beam_prune_k,
                    )

                jax.block_until_ready(beam_coll(params_c, wjr, wlr))
                dt_bc = _timeit(
                    lambda: beam_coll(params_c, wjr, wlr), iters,
                    jax.block_until_ready,
                )
                pre = f"beam16_collapsed_{tag}"
                collapsed_rows[f"{pre}_ms"] = round(dt_bc * 1e3, 2)
                collapsed_rows[f"{pre}_frames_kept"] = round(
                    T_cr / lp_cr.shape[1], 3
                )
                collapsed_rows[f"{pre}_audio_s_per_s_per_chip"] = round(
                    audio_s_r / dt_bc, 2
                )
            collapsed_rows["collapse_ckpt"] = (
                f"{auto} step {meta_c['step']}"
            )
            collapsed_rows["collapse_not_comparable"] = (
                "real (shorter) utterance lengths; synthetic full-length "
                "rows above use different audio_s"
            )

    for thresh, tag in thresholds:

        @jax.jit
        def collapsed_posteriors(params, wav, wav_lens, _th=thresh):
            feats, feat_lens = frontend(wav, wav_lens)
            logits, out_lens = trainer.model.apply(
                {"params": params}, feats, feat_lens, train=False
            )
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            return blank_collapse(lp, out_lens, threshold=_th)

        lp_c2, lens_c2 = collapsed_posteriors(trainer.state["params"], wj, wl)
        T_c2 = int(
            min(
                lp_c2.shape[1],
                max(64, -(-int(np.max(np.asarray(lens_c2))) // 64) * 64),
            )
        )

        @jax.jit
        def beam_step_collapsed(params, wav, wav_lens, _th=thresh, _T=T_c2):
            lp, lens = collapsed_posteriors(params, wav, wav_lens, _th)
            return beam_search_decode(
                lp[:, :_T], lens, beam_width=args.beam_width,
                max_label_len=max_label, merge_impl=args.beam_merge,
                prune_k=args.beam_prune_k,
            )

        jax.block_until_ready(
            beam_step_collapsed(trainer.state["params"], wj, wl)
        )
        dt_bc = _timeit(
            lambda: beam_step_collapsed(trainer.state["params"], wj, wl),
            iters,
            jax.block_until_ready,
        )
        collapsed_rows[f"beam16_collapsed_{tag}_audio_s_per_s_per_chip"] = (
            round(audio_s / dt_bc, 2)
        )
        collapsed_rows[f"beam16_collapsed_{tag}_frames_kept"] = round(
            T_c2 / T_full, 3
        )

    # ---------------- per-stage roofline breakdown ----------------
    breakdown = {}
    if args.breakdown:
        model = trainer.model
        params = trainer.state["params"]

        fe_j = jax.jit(frontend)
        feats, feat_lens = jax.block_until_ready(fe_j(wj, wl))

        @jax.jit
        def enc_fwd(params, feats, feat_lens):
            return model.apply({"params": params}, feats, feat_lens,
                               train=False)

        logits, out_lens = jax.block_until_ready(
            enc_fwd(params, feats, feat_lens)
        )

        from neuralasr_tpu.ctc.loss import ctc_loss

        lj = jnp.asarray(labels)
        llj = jnp.asarray(label_lens)

        @jax.jit
        def ctc_only(logits, out_lens):
            return ctc_loss(logits, lj, out_lens, llj,
                            impl=args.ctc_impl).sum()

        @jax.jit
        def loss_and_grad(params, feats, feat_lens):
            def f(p):
                lg, ol = model.apply({"params": p}, feats, feat_lens,
                                     train=False)
                per = ctc_loss(lg, lj, ol, llj, impl=args.ctc_impl)
                return jnp.where(per > 1e29, 0.0, per).mean()

            return jax.value_and_grad(f)(params)

        jax.block_until_ready(ctc_only(logits, out_lens))
        jax.block_until_ready(loss_and_grad(params, feats, feat_lens))

        stages = {
            "frontend": (fe_j, (wj, wl)),
            "encoder_fwd": (enc_fwd, (params, feats, feat_lens)),
            "ctc_loss": (ctc_only, (logits, out_lens)),
            "loss_fwd_bwd": (loss_and_grad, (params, feats, feat_lens)),
            "greedy_decode_e2e": (decode_step, (params, wj, wl)),
            "beam16_e2e": (beam_step, (params, wj, wl)),
        }
        for name, (fn, a) in stages.items():
            dt_s = _timeit(lambda fn=fn, a=a: fn(*a), iters,
                           jax.block_until_ready)
            flops = bytes_ = None
            try:
                flops, bytes_ = _cost(fn.lower(*a).compile())
            except Exception:
                pass
            entry = {"ms": round(dt_s * 1e3, 3)}
            if flops:
                entry["tflops_per_s"] = round(flops / dt_s / 1e12, 2)
                if peak:
                    entry["flops_util"] = round(flops / dt_s / peak, 4)
            if bytes_:
                entry["gbytes_per_s"] = round(bytes_ / dt_s / 1e9, 1)
            breakdown[name] = entry

    # Primary metric: train throughput; everything else rides along.
    value = round(train_tp, 2)
    vs = 1.0 if BASELINE_AUDIO_S_PER_S is None else round(
        value / BASELINE_AUDIO_S_PER_S, 3
    )
    out = {
        "metric": "train_audio_s_per_s_per_chip",
        "value": value,
        "unit": "audio_s/s",
        "vs_baseline": vs,
        "mfu": mfu,
        "train_step_ms": round(dt * 1e3, 2),
        "train_step_tflops": (
            round(train_flops / 1e12, 3) if train_flops else None
        ),
        "decode_audio_s_per_s_per_chip": round(decode_tp, 2),
        "beam16_audio_s_per_s_per_chip": round(beam_tp, 2),
        "beam_width": args.beam_width,
        "beam_merge": args.beam_merge,
        "beam_prune_k": args.beam_prune_k,
        "ctc_impl": args.ctc_impl,
        **collapsed_rows,
        "emissions": "trained_ckpt" if args.ckpt else "untrained",
        "pipeline_audio_s_per_s_prefetched": round(pipeline_tp, 2),
        # Feed-rate evidence (VERDICT r4 item 4): assembly alone must
        # out-run the device, and the padded-int16 wire bytes per audio
        # second x device rate give the H2D bandwidth a real host needs
        # (compare to >= 100 GB/s PCIe/DMA on real hosts vs the ~45 MB/s
        # axon tunnel that bounds the pipeline row above).
        "host_assembly_audio_s_per_s": round(host_assembly_tp, 2),
        "h2d_bytes_per_audio_s": round(bytes_per_audio_s, 1),
        "h2d_gbytes_per_s_for_device_rate": round(h2d_needed_gbs, 4),
        "backend": jax.default_backend(),
        "device_kind": getattr(jax.devices()[0], "device_kind", "?"),
        "model": args.model,
        "batch": B,
        "bucket_audio_s": audio_s / B,
    }
    if args.model != "bilstm4x512":
        out["pallas_attention"] = bool(use_pallas_attn)
        out["attn_impl"] = cfg.model.attn_impl
        out["conv_impl"] = cfg.model.conv_impl
        # None when the kernel is forced off: the threshold is then not part
        # of the compiled program, and recording it would make rows
        # irreproducible from the flags (ADVICE r3).
        out["attn_min_t"] = (
            cfg.model.pallas_attn_min_t if use_pallas_attn else None
        )
    if breakdown:
        # Honest-reading note (VERDICT r4 weak 7): these rows time each
        # stage as a STANDALONE dispatch, which overstates small stages
        # (the standalone frontend row measured ~3 ms where the in-step
        # trace attributes 0.59 ms — per-dispatch overhead dominates
        # sub-ms programs on this tunnel).  The in-step trace attribution
        # (tools/encoder_trace.py, runs/encoder_trace_attrib*.json) is
        # the per-stage cost claim; these rows are for roofline ratios
        # and big-stage (fwd+bwd, decode e2e) timing only.
        breakdown["_note"] = (
            "standalone-dispatch timings; in-step per-stage costs are the "
            "trace attribution (runs/encoder_trace_attrib*.json)"
        )
        out["breakdown"] = breakdown
    print(json.dumps(out))


if __name__ == "__main__":
    main()

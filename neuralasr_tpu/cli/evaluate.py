"""CLI evaluation/decode entry point with WER gate (SURVEY.md §5.5).

    python evaluate.py --config tiny --workdir runs/tiny [--beam 16]
        [--gate 0.35]   # exit 1 if WER exceeds the gate

Decodes the eval corpus with greedy and (optionally) beam search + n-gram
LM shallow fusion, prints corpus WER/CER, and enforces the gate
(BASELINE.json: "correctness gated on matching the reference repo's WER" —
the standing oracle is the recorded config-1 run, BASELINE.md).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="tiny")
    p.add_argument("--workdir", default=None)
    p.add_argument("--beam", type=int, default=None, help="beam width (default: preset)")
    p.add_argument("--greedy-only", action="store_true")
    p.add_argument("--max-utts", type=int, default=128)
    p.add_argument("--step", type=int, default=None,
                   help="restore a specific checkpoint step (default: latest)")
    p.add_argument("--gate", type=float, default=None, help="fail if WER > gate")
    p.add_argument("--lm-weight", type=float, default=None,
                   help="override the preset's shallow-fusion weight "
                        "(0 disables the LM; isolates the fusion gain)")
    p.add_argument("--blank-collapse", type=float, default=None,
                   metavar="THRESH",
                   help="drop frames with blank posterior > THRESH before "
                        "beam search (arXiv 2210.17017; e.g. 0.999)")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from neuralasr_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    from neuralasr_tpu.configs import PRESETS
    from neuralasr_tpu.training import Trainer, make_corpus, _Slice
    from neuralasr_tpu.utils.checkpoint import Checkpointer, abstract_like
    from neuralasr_tpu.utils.metrics import wer, cer
    from neuralasr_tpu.ctc.beam import beam_search_decode
    from neuralasr_tpu.ctc.greedy import greedy_decode
    from neuralasr_tpu.ctc.lm_fusion import NGramLM
    from neuralasr_tpu.data import BucketedLoader
    from neuralasr_tpu.text import decode as ids_to_text

    cfg = PRESETS[args.config]
    workdir = args.workdir or f"runs/{cfg.name}"
    trainer = Trainer(cfg)
    ckpt = Checkpointer(os.path.join(workdir, "ckpt"))
    state, meta = ckpt.restore(abstract_like(trainer.state), step=args.step)
    if state is None:
        print(f"[evaluate] no checkpoint under {workdir}/ckpt", file=sys.stderr)
        sys.exit(2)
    trainer.state = state
    step = meta["step"]

    eval_corpus = make_corpus(cfg, eval_split=True)
    beam_width = args.beam if args.beam is not None else cfg.beam_width

    lm_fn, lm_weight = None, 0.0
    if args.lm_weight is not None:
        cfg = dataclasses.replace(cfg, lm_weight=args.lm_weight,
                                  lm_order=cfg.lm_order if args.lm_weight > 0
                                  else 0)
    if cfg.lm_order > 0 and not args.greedy_only:
        train_corpus = make_corpus(cfg)
        lm = NGramLM.train(
            (train_corpus.transcript(i) for i in range(len(train_corpus))),
            order=cfg.lm_order,
        )
        lm_fn, lm_weight = lm.score_fn(), cfg.lm_weight

    loader = BucketedLoader(
        _Slice(eval_corpus, min(len(eval_corpus), args.max_utts)),
        trainer.buckets,
        seed=0,
    )
    refs, hyps_g, hyps_b = [], [], []
    fwd_fns = {}
    for batch in loader.epoch(0):
        if batch.bucket not in fwd_fns:
            frontend = trainer._frontend_for(batch.bucket)

            @jax.jit
            def fwd(params, wav, wav_lens, _fe=frontend):
                feats, feat_lens = _fe(wav, wav_lens)
                return trainer.model.apply(
                    {"params": params}, feats, feat_lens, train=False
                )

            fwd_fns[batch.bucket] = fwd
        logits, out_lens = fwd_fns[batch.bucket](
            trainer.state["params"],
            jnp.asarray(batch.wav),
            jnp.asarray(batch.wav_lens),
        )
        g_ids, g_lens = greedy_decode(logits, out_lens)
        g_ids, g_lens = np.asarray(g_ids), np.asarray(g_lens)
        if not args.greedy_only and beam_width > 1:
            beam_in, beam_lens = logits, out_lens
            if args.blank_collapse is not None:
                from neuralasr_tpu.ctc.beam import blank_collapse

                lp = jax.nn.log_softmax(logits, axis=-1)
                beam_in, beam_lens = blank_collapse(
                    lp, out_lens, threshold=args.blank_collapse
                )
                # Crop the left-compacted frames to a bucketed static length:
                # the beam scan then runs ~compression-factor fewer steps.
                # (Quantize to 64 so at most a handful of beam programs
                # compile across the whole eval.)
                T_c = int(
                    min(
                        beam_in.shape[1],
                        max(64, -(-int(np.max(np.asarray(beam_lens))) // 64) * 64),
                    )
                )
                beam_in = beam_in[:, :T_c]
            b_pref, b_lens, _ = beam_search_decode(
                beam_in,
                beam_lens,
                beam_width=beam_width,
                max_label_len=int(batch.labels.shape[1]) + 8,
                lm_fn=lm_fn,
                lm_weight=lm_weight,
            )
            b_pref, b_lens = np.asarray(b_pref), np.asarray(b_lens)
        for r in range(g_ids.shape[0]):
            if batch.weights[r] == 0:
                continue
            refs.append(ids_to_text(batch.labels[r, : batch.label_lens[r]]))
            hyps_g.append(ids_to_text(g_ids[r, : g_lens[r]]))
            if not args.greedy_only and beam_width > 1:
                hyps_b.append(ids_to_text(b_pref[r, 0, : b_lens[r, 0]]))

    out = {
        "config": cfg.name,
        "step": int(step),
        "utts": len(refs),
        "greedy_wer": wer(refs, hyps_g),
        "greedy_cer": cer(refs, hyps_g),
    }
    if hyps_b:
        out["beam_wer"] = wer(refs, hyps_b)
        out["beam_cer"] = cer(refs, hyps_b)
        out["beam_width"] = beam_width
        out["lm_weight"] = lm_weight
    print(json.dumps(out))

    if args.gate is not None:
        gated = out.get("beam_wer", out["greedy_wer"])
        if gated > args.gate:
            print(f"[evaluate] WER gate FAILED: {gated:.4f} > {args.gate}",
                  file=sys.stderr)
            sys.exit(1)
        print(f"[evaluate] WER gate passed: {gated:.4f} <= {args.gate}")


if __name__ == "__main__":
    main()

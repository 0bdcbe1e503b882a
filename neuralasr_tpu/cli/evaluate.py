"""CLI evaluation/decode entry point with WER gate (SURVEY.md §5.5).

    python evaluate.py --config tiny --workdir runs/tiny [--beam 16]
        [--gate 0.35]   # exit 1 if WER exceeds the gate

Decodes the eval corpus with greedy and (optionally) beam search + n-gram
LM shallow fusion via neuralasr_tpu.evaluation (decode jit'd under the
mesh; multi-process capable with --distributed: every host decodes its
row-slice and all-gathers, printing identical metrics), prints corpus
WER/CER, and enforces the gate (BASELINE.json: "correctness gated on
matching the reference repo's WER" — the standing oracle is the recorded
config-1 run, BASELINE.md).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys


def resolve_blank_collapse(cli_threshold, cli_off, preset_default):
    """Blank-collapse threshold precedence: --no-blank-collapse beats an
    explicit --blank-collapse, which beats the preset's
    eval_blank_collapse (None = off).  Factored out so the preset-default
    flip (BASELINE.md r5 ladder collapse evidence) is unit-testable."""
    if cli_off:
        return None
    if cli_threshold is not None:
        return cli_threshold
    return preset_default


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
                        "beam search (arXiv 2210.17017; e.g. 0.999); "
                        "default: the preset's eval_blank_collapse")
    p.add_argument("--no-blank-collapse", action="store_true",
                   help="force collapse off, overriding the preset default")
    p.add_argument("--eval-noise", type=float, default=None,
                   help="override the eval split's additive-noise floor "
                        "(preset eval_noise_level; train noise is 0.05)")
    p.add_argument("--eval-shift", type=float, default=None, metavar="HZ",
                   help="override the eval split's formant shift in Hz")
    p.add_argument("--eval-seed-offset", type=int, default=0,
                   help="offset the eval corpus seed (disjoint-seed re-eval "
                        "to separate drift from protocol variance)")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--distributed", action="store_true",
                   help="call jax.distributed.initialize() (multi-host)")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from neuralasr_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    if args.distributed:
        jax.distributed.initialize()

    from neuralasr_tpu.configs import PRESETS
    from neuralasr_tpu.ctc.lm_fusion import NGramLM
    from neuralasr_tpu.evaluation import evaluate_corpus
    from neuralasr_tpu.training import Trainer, make_corpus
    from neuralasr_tpu.utils.checkpoint import Checkpointer, abstract_like

    cfg = PRESETS[args.config]
    if args.eval_noise is not None:
        cfg = dataclasses.replace(cfg, eval_noise_level=args.eval_noise)
    if args.eval_shift is not None:
        cfg = dataclasses.replace(cfg, eval_formant_shift_hz=args.eval_shift)
    workdir = args.workdir or f"runs/{cfg.name}"
    trainer = Trainer(
        cfg,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )
    ckpt = Checkpointer(os.path.join(workdir, "ckpt"))
    state, meta = ckpt.restore(abstract_like(trainer.state), step=args.step)
    if state is None:
        print(f"[evaluate] no checkpoint under {workdir}/ckpt", file=sys.stderr)
        sys.exit(2)
    trainer.state = state
    step = meta["step"]

    eval_cfg = (
        dataclasses.replace(cfg, seed=cfg.seed + args.eval_seed_offset)
        if args.eval_seed_offset
        else cfg
    )
    eval_corpus = make_corpus(eval_cfg, eval_split=True)
    beam_width = args.beam if args.beam is not None else cfg.beam_width
    if args.greedy_only:
        beam_width = 0

    lm_fn, lm_weight = None, 0.0
    if args.lm_weight is not None:
        cfg = dataclasses.replace(cfg, lm_weight=args.lm_weight,
                                  lm_order=cfg.lm_order if args.lm_weight > 0
                                  else 0)
    if cfg.lm_order > 0 and beam_width > 1:
        train_corpus = make_corpus(cfg)
        lm = NGramLM.train(
            (train_corpus.transcript(i) for i in range(len(train_corpus))),
            order=cfg.lm_order,
        )
        lm_fn, lm_weight = lm.score_fn(), cfg.lm_weight

    collapse = resolve_blank_collapse(
        args.blank_collapse, args.no_blank_collapse, cfg.eval_blank_collapse
    )
    res = evaluate_corpus(
        trainer,
        eval_corpus,
        max_utts=args.max_utts,
        beam_width=beam_width,
        lm_fn=lm_fn,
        lm_weight=lm_weight,
        blank_collapse_threshold=collapse,
    )

    out = {
        "config": cfg.name,
        "step": int(step),
        "eval_noise": cfg.eval_noise_level,
        "eval_shift_hz": cfg.eval_formant_shift_hz,
        "eval_seed_offset": args.eval_seed_offset,
        "blank_collapse": collapse,
        **res.to_dict(),
    }
    if res.beam_wer is not None:
        out["beam_width"] = beam_width
        out["lm_weight"] = lm_weight
    if jax.process_index() == 0:
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

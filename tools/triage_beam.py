"""Beam-vs-greedy disagreement triage (VERDICT r2 item 5).

Round 2 recorded config-2 beam-16 (8.52 %) slightly WORSE than greedy
(8.41 %) on the standard protocol and left it unexamined.  This tool loads
the trained checkpoint, decodes the eval split with both decoders, and for
every utterance where they disagree:

  - scores both hypotheses against the reference (who actually won);
  - re-decodes the SAME posteriors with the transparent host-python beam
    oracle (reference/beam_oracle.py) at the same width, so an on-device
    kernel bug at real T (~900 frames) would show up as device!=oracle;
  - compares the CTC sum-over-alignments score of the two hypotheses,
    verifying that when beam loses on WER it genuinely chose the
    higher-likelihood string (correct beam behavior: the model, not the
    search, is wrong).

Prints a JSON summary plus a worked example; exit 1 if the device beam
diverges from the host oracle on any triaged utterance.

    python tools/triage_beam.py --workdir runs/base_r2 --max-utts 256 --cpu
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="base")
    p.add_argument("--workdir", default="runs/base_r2")
    p.add_argument("--max-utts", type=int, default=256)
    p.add_argument("--beam", type=int, default=16)
    p.add_argument("--oracle-cases", type=int, default=16,
                   help="max disagreements to re-decode with the host oracle")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from neuralasr_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    from neuralasr_tpu.configs import PRESETS
    from neuralasr_tpu.ctc.beam import beam_search_decode
    from neuralasr_tpu.ctc.greedy import greedy_decode
    from neuralasr_tpu.ctc.loss import ctc_loss
    from neuralasr_tpu.data import BucketedLoader
    from neuralasr_tpu.evaluation import _Slice
    from neuralasr_tpu.reference import beam_oracle
    from neuralasr_tpu.text import decode as ids_to_text, encode
    from neuralasr_tpu.training import Trainer, make_corpus
    from neuralasr_tpu.utils.checkpoint import Checkpointer, abstract_like
    from neuralasr_tpu.utils.metrics import wer

    cfg = PRESETS[args.config]
    trainer = Trainer(cfg)
    ckpt = Checkpointer(f"{args.workdir}/ckpt")
    state, meta = ckpt.restore(abstract_like(trainer.state))
    ckpt.close()
    if state is None:
        raise SystemExit(f"no checkpoint under {args.workdir}/ckpt")
    trainer.state = state

    corpus = make_corpus(cfg, eval_split=True)
    loader = BucketedLoader(
        _Slice(corpus, min(len(corpus), args.max_utts)),
        trainer.buckets,
        seed=0,
    )

    disagreements = []
    refs_all, g_all, b_all = [], [], []
    for batch in loader.epoch(0):
        frontend = trainer._frontend_for(batch.bucket)

        @jax.jit
        def fwd(params, wav, wav_lens):
            feats, feat_lens = frontend(wav, wav_lens)
            logits, out_lens = trainer.model.apply(
                {"params": params}, feats, feat_lens, train=False
            )
            return (
                jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1),
                out_lens,
            )

        wav = jnp.asarray(batch.wav)
        lp, out_lens = fwd(trainer.state["params"], wav,
                           jnp.asarray(batch.wav_lens))
        g_ids, g_lens = greedy_decode(lp, out_lens)
        b_pref, b_lens, b_scores = beam_search_decode(
            lp, out_lens, beam_width=args.beam,
            max_label_len=int(batch.labels.shape[1]) + 8,
        )
        lp, out_lens, g_ids, g_lens, b_pref, b_lens = (
            np.asarray(x) for x in (lp, out_lens, g_ids, g_lens,
                                    b_pref, b_lens)
        )
        for r in range(lp.shape[0]):
            if batch.weights[r] == 0:
                continue
            ref = ids_to_text(batch.labels[r, : batch.label_lens[r]])
            g_txt = ids_to_text(g_ids[r, : g_lens[r]])
            b_txt = ids_to_text(b_pref[r, 0, : b_lens[r, 0]])
            refs_all.append(ref)
            g_all.append(g_txt)
            b_all.append(b_txt)
            if g_txt != b_txt:
                disagreements.append(
                    dict(ref=ref, greedy=g_txt, beam=b_txt,
                         lp=lp[r], T=int(out_lens[r]))
                )

    n = len(refs_all)
    greedy_wer = wer(refs_all, g_all)
    beam_wer = wer(refs_all, b_all)

    # Per-case: who won on WER, did the device beam match the host oracle,
    # and did beam pick the higher sum-over-alignments likelihood?
    beam_wins = greedy_wins = ties = 0
    oracle_mismatches = 0
    beam_higher_ll = 0
    example = None
    for k, d in enumerate(disagreements):
        rw = wer([d["ref"]], [d["greedy"]])
        bw = wer([d["ref"]], [d["beam"]])
        if bw < rw:
            beam_wins += 1
        elif rw < bw:
            greedy_wins += 1
        else:
            ties += 1

        lp_t = d["lp"][: d["T"]]

        def seq_ll(text):
            ids = np.asarray(encode(text), np.int32)
            if len(ids) == 0:
                ids = np.zeros(1, np.int32)
                ll_len = 0
            else:
                ll_len = len(ids)
            loss = ctc_loss(
                jnp.asarray(d["lp"][None]),
                jnp.asarray(ids[None]),
                jnp.asarray([d["T"]], jnp.int32),
                jnp.asarray([ll_len], jnp.int32),
                log_probs_in=True,
            )
            return -float(loss[0])

        if seq_ll(d["beam"]) >= seq_ll(d["greedy"]) - 1e-4:
            beam_higher_ll += 1

        if k < args.oracle_cases:
            want = beam_oracle.beam_search_single(
                lp_t, d["T"], beam_width=args.beam, prune_logp=-1e9
            )
            oracle_txt = ids_to_text(want[0][0])
            if oracle_txt != d["beam"]:
                oracle_mismatches += 1
                print(f"[triage] ORACLE MISMATCH: device={d['beam']!r} "
                      f"oracle={oracle_txt!r}", file=sys.stderr)
        if example is None and bw > rw:
            example = {k2: d[k2] for k2 in ("ref", "greedy", "beam")}

    out = {
        "metric": "beam_greedy_triage",
        "config": args.config,
        "utts": n,
        "greedy_wer": round(greedy_wer, 5),
        "beam_wer": round(beam_wer, 5),
        "disagreements": len(disagreements),
        "beam_wins": beam_wins,
        "greedy_wins": greedy_wins,
        "ties": ties,
        "beam_chose_higher_likelihood": beam_higher_ll,
        "oracle_cases_checked": min(len(disagreements), args.oracle_cases),
        "oracle_mismatches": oracle_mismatches,
        "example_beam_loss": example,
    }
    print(json.dumps(out, indent=2))
    sys.exit(1 if oracle_mismatches else 0)


if __name__ == "__main__":
    main()

"""Multi-host-aware evaluation: greedy + beam(+LM) decode with corpus WER/CER
(SURVEY.md §4.5, §6 "all-gather for eval metrics").

One code path serves the single-chip CLI, the in-training eval hook, and
multi-process pods:

  - each process materializes only its row block of every eval batch
    (loader row-slice protocol) and uploads it into the global mesh via
    Trainer.put_batch;
  - the forward + greedy decode and the beam search run jit'd UNDER the
    mesh (batch rows sharded over 'data'; beam state stays per-utterance,
    SURVEY.md §4.5);
  - hypothesis ids and reference labels are all-gathered across processes
    so every host computes the identical corpus metrics.

Optional blank-collapse (arXiv 2210.17017) compresses emissions before the
beam scan; the compacted frames are cropped to a static 64-quantized length
so the scan genuinely runs fewer steps per batch.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .ctc.beam import beam_search_decode, blank_collapse
from .ctc.greedy import greedy_decode
from .data import BucketedLoader
from .text import decode as ids_to_text
from .utils.metrics import cer, wer, wer_bootstrap_ci


@dataclasses.dataclass
class EvalResult:
    utts: int
    greedy_wer: float
    greedy_cer: float
    beam_wer: float | None = None
    beam_cer: float | None = None
    # Bootstrap 95% CIs over the eval utterances (protocol noise scale —
    # VERDICT r3 item 4); (lo, hi) tuples.
    greedy_wer_ci: tuple | None = None
    beam_wer_ci: tuple | None = None

    def to_dict(self) -> dict:
        d = {
            "utts": self.utts,
            "greedy_wer": self.greedy_wer,
            "greedy_cer": self.greedy_cer,
        }
        if self.greedy_wer_ci is not None:
            d["greedy_wer_ci95"] = list(self.greedy_wer_ci)
        if self.beam_wer is not None:
            d["beam_wer"] = self.beam_wer
            d["beam_cer"] = self.beam_cer
            if self.beam_wer_ci is not None:
                d["beam_wer_ci95"] = list(self.beam_wer_ci)
        return d


def _gather(multi: bool, *arrays):
    """Sharded global arrays / local host arrays -> full np values on every
    process (identity in single-process mode)."""
    if not multi:
        return tuple(np.asarray(a) for a in arrays)
    from jax.experimental import multihost_utils

    out = multihost_utils.process_allgather(tuple(arrays), tiled=True)
    return tuple(np.asarray(a) for a in out)


def evaluate_corpus(
    trainer,
    corpus,
    max_utts: int = 512,
    beam_width: int = 0,
    lm_fn=None,
    lm_weight: float = 0.0,
    blank_collapse_threshold: float | None = None,
    bootstrap_ci: bool = True,
) -> EvalResult:
    """Decode the first max_utts of `corpus` with the trainer's model.

    beam_width == 0 or 1 -> greedy only.  Multi-process safe: call from
    every process; all return identical metrics.
    """
    multi = jax.process_count() > 1
    loader = BucketedLoader(
        _Slice(corpus, min(len(corpus), max_utts)),
        trainer.buckets,
        seed=0,
        process_index=jax.process_index() if multi else 0,
        process_count=jax.process_count() if multi else 1,
    )
    refs, hyps_g, hyps_b = [], [], []
    # Compiled programs live on the Trainer so the second eval call traces
    # nothing (previously module-local dicts re-traced every eval —
    # VERDICT r2 weak #4).
    fwd_fns = trainer.eval_fwd_fns
    beam_fns = trainer.eval_beam_fns

    do_beam = beam_width > 1
    for batch in loader.epoch(0):
        fwd_key = (batch.bucket, do_beam)
        if fwd_key not in fwd_fns:
            frontend = trainer._frontend_for(batch.bucket)

            @jax.jit
            def fwd(params, wav, wav_lens, _fe=frontend):
                feats, feat_lens = _fe(wav, wav_lens)
                logits, out_lens = trainer.model.apply(
                    {"params": params}, feats, feat_lens, train=False
                )
                g_ids, g_lens = greedy_decode(logits, out_lens)
                # Full-vocab f32 posteriors only when beam decode will
                # consume them — greedy works off logits directly.
                lp = (
                    jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
                    if do_beam
                    else None
                )
                return lp, out_lens, g_ids, g_lens

            fwd_fns[fwd_key] = fwd

        wav, wav_lens, labels_d, label_lens_d, weights_d = trainer.put_batch(
            batch, loader=loader
        )
        lp, out_lens, g_ids, g_lens = fwd_fns[fwd_key](
            trainer.state["params"], wav, wav_lens
        )

        if do_beam:
            max_label = int(batch.labels.shape[1]) + 8
            beam_in, beam_lens = lp, out_lens
            T_c = int(beam_in.shape[1])
            if blank_collapse_threshold is not None:
                beam_in, beam_lens = blank_collapse(
                    lp, out_lens, threshold=blank_collapse_threshold
                )
                (lens_host,) = _gather(multi, beam_lens)
                # Static 64-quantized crop: every process computes the same
                # global max, so they compile and run the same program.
                T_c = int(
                    min(
                        beam_in.shape[1],
                        max(64, -(-int(lens_host.max()) // 64) * 64),
                    )
                )
            key = (
                batch.bucket, T_c, beam_width, max_label,
                id(lm_fn), lm_weight,
            )
            if key not in beam_fns:

                def bfn(lp_c, lens_c, _T=T_c):
                    return beam_search_decode(
                        lp_c[:, :_T],
                        lens_c,
                        beam_width=beam_width,
                        max_label_len=max_label,
                        lm_fn=lm_fn,
                        lm_weight=lm_weight,
                    )

                beam_fns[key] = jax.jit(bfn)
            b_pref, b_lens, _ = beam_fns[key](beam_in, beam_lens)
            g_ids, g_lens, b_pref, b_lens, labels, label_lens, weights = (
                _gather(
                    multi, g_ids, g_lens, b_pref, b_lens,
                    labels_d, label_lens_d, weights_d,
                )
            )
        else:
            g_ids, g_lens, labels, label_lens, weights = _gather(
                multi, g_ids, g_lens, labels_d, label_lens_d, weights_d
            )

        for r in range(g_ids.shape[0]):
            if weights[r] == 0:
                continue
            refs.append(ids_to_text(labels[r, : label_lens[r]]))
            hyps_g.append(ids_to_text(g_ids[r, : g_lens[r]]))
            if do_beam:
                hyps_b.append(ids_to_text(b_pref[r, 0, : b_lens[r, 0]]))

    res = EvalResult(
        utts=len(refs),
        greedy_wer=wer(refs, hyps_g),
        greedy_cer=cer(refs, hyps_g),
    )
    if bootstrap_ci and refs:
        res.greedy_wer_ci = wer_bootstrap_ci(refs, hyps_g)
    if hyps_b:
        res.beam_wer = wer(refs, hyps_b)
        res.beam_cer = cer(refs, hyps_b)
        if bootstrap_ci:
            res.beam_wer_ci = wer_bootstrap_ci(refs, hyps_b)
    return res


class _Slice:
    """First-n view of a corpus (corpus protocol passthrough)."""

    def __init__(self, corpus, n: int):
        self.corpus, self.n = corpus, n

    def __len__(self):
        return self.n

    def transcript(self, i):
        return self.corpus.transcript(i)

    def waveform(self, i):
        return self.corpus.waveform(i)

    def __getitem__(self, i):
        return self.corpus[i]

    def num_samples(self, i):
        return self.corpus.num_samples(i)

"""Config-1 integration tests (SURVEY.md §5.2): tiny model overfits a toy
set; loader determinism; checkpoint resume."""

import dataclasses

import numpy as np
import jax
import pytest

from neuralasr_tpu.configs import CONFIG1
from neuralasr_tpu.training import Trainer
from neuralasr_tpu.data import SyntheticCorpus, BucketedLoader
from neuralasr_tpu.data.buckets import default_buckets


@pytest.fixture(scope="module")
def tiny_cfg():
    return dataclasses.replace(
        CONFIG1,
        num_utterances=16,
        batch_size=8,
        warmup_steps=5,
        lr=3e-3,
        model=dataclasses.replace(CONFIG1.model, num_layers=1, hidden=96),
    )


def test_overfit_toy_batch(tiny_cfg):
    tr = Trainer(tiny_cfg)
    batch = next(iter(tr.loader.epoch(0)))
    first = tr.train_batch(batch)["loss"]
    last = None
    for _ in range(59):
        last = tr.train_batch(batch)["loss"]
    assert last < 0.25 * first, (first, last)


def test_loader_deterministic_and_seeded():
    corpus = SyntheticCorpus(24, seed=3)
    buckets = default_buckets(4)
    a = BucketedLoader(corpus, buckets, seed=7)
    b = BucketedLoader(corpus, buckets, seed=7)
    plan_a, plan_b = a.plan(2), b.plan(2)
    assert plan_a == plan_b
    assert a.plan(1) != a.plan(2)  # epochs reshuffle
    ba = next(iter(a.epoch(0)))
    bb = next(iter(b.epoch(0)))
    np.testing.assert_array_equal(ba.wav, bb.wav)
    np.testing.assert_array_equal(ba.labels, bb.labels)


def test_resume_mid_epoch_matches():
    corpus = SyntheticCorpus(24, seed=3)
    buckets = default_buckets(4)
    loader = BucketedLoader(corpus, buckets, seed=7)
    full = list(loader.epoch(0))
    resumed = list(loader.epoch(0, start_batch=2))
    assert len(resumed) == len(full) - 2
    np.testing.assert_array_equal(resumed[0].wav, full[2].wav)
    assert resumed[0].index == full[2].index


def test_checkpoint_roundtrip(tmp_path, tiny_cfg):
    """Save -> restore into a fresh Trainer -> identical continuation.

    Exercises the orbax Checkpointer (utils/checkpoint.py) the way the CLIs
    use it: the restored {params, opt_state} must produce the same next-step
    loss as the uninterrupted run (the reference's Saver.save/restore
    contract, SURVEY.md §6)."""
    from neuralasr_tpu.utils.checkpoint import Checkpointer, abstract_like

    tr = Trainer(tiny_cfg)
    batches = list(tr.loader.epoch(0))
    for b in batches[:2]:
        tr.train_batch(b)

    ckpt = Checkpointer(str(tmp_path / "ckpt"))
    ckpt.save(
        tr.step,
        tr.state,
        {"step": tr.step, "epoch": 0, "batch_index": 1,
         "config": tiny_cfg.to_json()},
    )
    ref_loss = float(tr.train_batch(batches[0])["loss"])

    tr2 = Trainer(tiny_cfg)
    state, meta = ckpt.restore(abstract_like(tr2.state))
    ckpt.close()
    assert meta["step"] == 2 and meta["batch_index"] == 1
    tr2.state = state
    tr2.step = int(meta["step"])
    resumed_loss = float(tr2.train_batch(batches[0])["loss"])
    np.testing.assert_allclose(resumed_loss, ref_loss, rtol=1e-5, atol=1e-6)


def test_async_checkpoint_survives_donated_steps(tmp_path, tiny_cfg):
    """save() is async (VERDICT r2 item 8): the step loop continues — and
    DONATES the state buffers — while the write streams out.  The restored
    checkpoint must equal the state at save time, not any later step
    (orbax D2H-copies synchronously before save() returns)."""
    from neuralasr_tpu.utils.checkpoint import Checkpointer, abstract_like

    tr = Trainer(tiny_cfg)
    batch = next(iter(tr.loader.epoch(0)))
    tr.train_batch(batch)
    snap = jax.tree.map(np.asarray, tr.state["params"])

    ckpt = Checkpointer(str(tmp_path / "ckpt"))
    ckpt.save(tr.step, tr.state, {"step": tr.step, "config": "t"})
    for _ in range(5):  # donate/overwrite state while the save is in flight
        tr.train_batch(batch)
    state, meta = ckpt.restore(abstract_like(tr.state))
    ckpt.close()
    assert meta["step"] == 1
    for a, b in zip(
        jax.tree.leaves(snap), jax.tree.leaves(state["params"])
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_eval_programs_cached_on_trainer(tiny_cfg):
    """Second evaluate_corpus call must reuse the Trainer-held compiled
    programs — no new cache entries, no re-trace (VERDICT r2 weak #4)."""
    from neuralasr_tpu.evaluation import evaluate_corpus
    from neuralasr_tpu.training import make_corpus

    tr = Trainer(tiny_cfg)
    corpus = make_corpus(tiny_cfg, eval_split=True)
    evaluate_corpus(tr, corpus, max_utts=8, beam_width=4)
    fwd_ids = {k: id(v) for k, v in tr.eval_fwd_fns.items()}
    beam_keys = set(tr.eval_beam_fns)
    assert fwd_ids and beam_keys
    traces = {k: v._cache_size() for k, v in tr.eval_fwd_fns.items()}
    evaluate_corpus(tr, corpus, max_utts=8, beam_width=4)
    assert {k: id(v) for k, v in tr.eval_fwd_fns.items()} == fwd_ids
    assert set(tr.eval_beam_fns) == beam_keys
    # Reused programs hit the jit cache: no additional traces recorded.
    assert {k: v._cache_size() for k, v in tr.eval_fwd_fns.items()} == traces


def test_checkpoint_restore_empty(tmp_path):
    from neuralasr_tpu.utils.checkpoint import Checkpointer

    ckpt = Checkpointer(str(tmp_path / "ckpt"))
    state, meta = ckpt.restore(None)
    ckpt.close()
    assert state is None and meta is None


def test_wer_gate_fails_on_seeded_regression(tmp_path, tiny_cfg, capsys):
    """evaluate.py --gate must exit non-zero when WER exceeds the gate
    (VERDICT r2 item 4's done-criterion: the ladder fails on regression
    instead of recording numbers).  An untrained checkpoint against an
    impossible gate is the seeded regression."""
    import json
    import sys

    from neuralasr_tpu.cli import evaluate as eval_cli
    from neuralasr_tpu.configs import PRESETS
    from neuralasr_tpu.utils.checkpoint import Checkpointer

    cfg = dataclasses.replace(tiny_cfg, name="_gatetest")
    PRESETS["_gatetest"] = cfg
    try:
        tr = Trainer(cfg)
        workdir = str(tmp_path / "wd")
        ck = Checkpointer(workdir + "/ckpt")
        ck.save(1, tr.state, {"step": 1, "config": cfg.to_json()},
                blocking=True)
        ck.close()
        argv = ["evaluate.py", "--config", "_gatetest", "--workdir",
                workdir, "--max-utts", "8", "--greedy-only", "--cpu"]
        old = sys.argv
        # Impossible gate: untrained WER ~1.0 >> 1e-6 -> must exit 1.
        sys.argv = argv + ["--gate", "0.000001"]
        try:
            with pytest.raises(SystemExit) as e:
                eval_cli.main()
            assert e.value.code == 1
        finally:
            sys.argv = old
        out = capsys.readouterr().out.strip().splitlines()[-1]
        assert json.loads(out)["greedy_wer"] > 0.5  # the regression is real
        # Generous gate on the same checkpoint passes (exit 0 = no raise).
        sys.argv = argv + ["--gate", "5.0"]
        try:
            eval_cli.main()
        finally:
            sys.argv = old
    finally:
        PRESETS.pop("_gatetest", None)


def test_synthetic_corpus_deterministic():
    c1 = SyntheticCorpus(8, seed=5)
    c2 = SyntheticCorpus(8, seed=5)
    for i in (0, 3, 7):
        assert c1.transcript(i) == c2.transcript(i)
        np.testing.assert_array_equal(c1.waveform(i), c2.waveform(i))
    c3 = SyntheticCorpus(8, seed=6)
    assert any(c1.transcript(i) != c3.transcript(i) for i in range(8))

"""TRUE multi-process distributed checks (VERDICT.md round-1 item 1).

Round 1's distributed evidence was all single-process fake-device GSPMD;
nothing had ever executed with jax.process_count() > 1.  This worker runs
under a real N-process jax.distributed group on CPU (gloo collectives,
jax_num_cpu_devices fake devices per process, localhost coordinator) and
exercises the full multi-host path the north-star mandates:

  - jax.distributed.initialize() with an explicit coordinator
  - per-process data loading via the loader's row-slice protocol
  - global batch assembly via jax.make_array_from_process_local_data
    (Trainer.put_batch multi-process branch)
  - 2 epochs of jit'd DP training under the global mesh
  - multi-host greedy_wer (sharded decode + eval all-gather)
  - orbax checkpoint save from all processes + restore + one more step

Usage (spawned by tests/test_multiprocess.py):
  python multiprocess_check.py single <local_devices> <out.json>
  python multiprocess_check.py worker <pid> <nproc> <local_devices> \
      <port> <workdir> <out.json>

The launcher compares every worker's JSON against the single-process run:
losses must match to float32 tolerance (identical global batches, identical
GSPMD program over the same global device count).
"""

import json
import os
import sys


def main() -> None:
    mode = sys.argv[1]
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

    import jax

    if mode == "worker":
        pid, nproc, ndev = int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
        port, workdir, out_path = sys.argv[5], sys.argv[6], sys.argv[7]
        jax.config.update("jax_num_cpu_devices", ndev)
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(
            coordinator_address=f"localhost:{port}",
            num_processes=nproc,
            process_id=pid,
        )
    else:
        ndev, out_path = int(sys.argv[2]), sys.argv[3]
        workdir = os.path.dirname(out_path)
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", ndev)

    import dataclasses

    import numpy as np

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )

    from neuralasr_tpu.configs import CONFIG1
    from neuralasr_tpu.parallel.mesh import make_mesh
    from neuralasr_tpu.training import Trainer, make_corpus
    from neuralasr_tpu.utils.checkpoint import Checkpointer, abstract_like

    # min_words=4 keeps every utterance in buckets whose batch size is
    # divisible by 4 (global device count) and by nproc.
    cfg = dataclasses.replace(
        CONFIG1,
        num_utterances=24,
        batch_size=16,
        epochs=2,
        warmup_steps=2,
        lr=1e-3,
        model=dataclasses.replace(CONFIG1.model, num_layers=1, hidden=64),
    )
    n_global = jax.device_count()
    assert n_global == 4, f"expected 4 global devices, got {n_global}"
    mesh = make_mesh(4)
    trainer = Trainer(
        cfg,
        mesh=mesh,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )

    losses, gnorms = [], []
    first_batch = None
    for epoch in range(cfg.epochs):
        for batch in trainer.loader.epoch(epoch):
            assert batch.wav.shape[0] % 4 == 0, batch.wav.shape
            if first_batch is None:
                first_batch = batch
            m = trainer.train_batch(batch)
            losses.append(float(m["loss"]))
            gnorms.append(float(m["grad_norm"]))

    # Multi-host eval: sharded decode + all-gather; every process must
    # compute the identical WER.  Beam search (with blank-collapse and its
    # static crop) also runs under the multi-process mesh.
    from neuralasr_tpu.evaluation import evaluate_corpus

    eval_corpus = make_corpus(cfg, eval_split=True)
    wer = trainer.greedy_wer(eval_corpus, max_utts=16)
    beam_res = evaluate_corpus(
        trainer,
        eval_corpus,
        max_utts=16,
        beam_width=4,
        blank_collapse_threshold=0.999,
    )

    # Multi-process checkpoint: all processes save collectively, restore,
    # then take one more step — the loss pins save/restore exactness.
    ckpt = Checkpointer(os.path.join(workdir, "ckpt"))
    ckpt.save(trainer.step, trainer.state, {"step": trainer.step})
    state, _meta = ckpt.restore(abstract_like(trainer.state))
    trainer.state = state
    m = trainer.train_batch(first_batch)
    resume_loss = float(m["loss"])
    ckpt.close()

    result = {
        "mode": mode,
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "global_devices": n_global,
        "losses": losses,
        "grad_norms": gnorms,
        "greedy_wer": wer,
        "beam_wer": beam_res.beam_wer,
        "resume_loss": resume_loss,
    }
    with open(out_path, "w") as fh:
        json.dump(result, fh)
    print(f"proc {jax.process_index()}: MULTIPROCESS-CHECK-OK", flush=True)


if __name__ == "__main__":
    main()

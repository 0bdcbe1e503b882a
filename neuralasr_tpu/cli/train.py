"""CLI training entry point (SURVEY.md §2 L6 equivalent).

    python train.py --config tiny --workdir runs/tiny [--epochs N] [--resume]

Multi-host: launch one process per host with JAX_PROCESS_COUNT/... env (or
let jax.distributed.initialize pick up the TPU pod env); data loading and
checkpointing are process-aware.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="tiny", help="preset name (configs.py)")
    p.add_argument("--workdir", default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--num-utterances", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--corpus", default=None, help="'synthetic' or LibriSpeech root")
    p.add_argument("--specaugment", type=int, default=None, choices=[0, 1],
                   help="override the preset's SpecAugment switch (masking "
                        "random-text synthetic data is unlearnable — masked "
                        "chars have no contextual redundancy)")
    p.add_argument("--frame-stack", type=int, default=None,
                   help="stack k frames before a BiLSTM encoder (k x fewer "
                        "recurrence steps; see models/encoder.py)")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--cpu", action="store_true", help="force XLA:CPU")
    p.add_argument("--distributed", action="store_true",
                   help="call jax.distributed.initialize() (multi-host pods)")
    p.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                   help="explicit coordinator for --distributed (TPU pods "
                        "autodetect; CPU multi-process needs it)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--cpu-devices", type=int, default=None,
                   help="fake CPU devices per process (CPU multi-process "
                        "testing; enables gloo collectives)")
    p.add_argument("--eval-every", type=int, default=0,
                   help="greedy-WER eval every N epochs (0 = only at end)")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a jax.profiler trace of steps 10-20 into DIR "
                        "(view with TensorBoard/Perfetto)")
    p.add_argument("--debug-nans", action="store_true",
                   help="enable jax_debug_nans (slow; debugging only)")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from neuralasr_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    if args.cpu_devices:
        jax.config.update("jax_num_cpu_devices", args.cpu_devices)
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    if args.distributed:
        if args.coordinator:
            jax.distributed.initialize(
                coordinator_address=args.coordinator,
                num_processes=args.num_processes,
                process_id=args.process_id,
            )
        else:
            jax.distributed.initialize()
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    from neuralasr_tpu.configs import PRESETS
    from neuralasr_tpu.data.prefetch import DevicePrefetcher
    from neuralasr_tpu.training import Trainer, make_corpus
    from neuralasr_tpu.utils.checkpoint import Checkpointer, abstract_like
    from neuralasr_tpu.utils.logging import MetricsLogger

    cfg = PRESETS[args.config]
    overrides = {
        k: v
        for k, v in {
            "epochs": args.epochs,
            "num_utterances": args.num_utterances,
            "batch_size": args.batch_size,
            "lr": args.lr,
            "seed": args.seed,
            "corpus": args.corpus,
            "specaugment": (
                None if args.specaugment is None else bool(args.specaugment)
            ),
        }.items()
        if v is not None
    }
    cfg = dataclasses.replace(cfg, **overrides)
    if args.frame_stack is not None:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, frame_stack=args.frame_stack)
        )

    workdir = args.workdir or f"runs/{cfg.name}"
    os.makedirs(workdir, exist_ok=True)
    proc_idx = jax.process_index()
    proc_cnt = jax.process_count()
    logger = MetricsLogger(
        os.path.join(workdir, f"metrics.{proc_idx}.jsonl"),
        mirror_every=cfg.log_every,
    )
    print(f"[train] config={cfg.name} devices={jax.device_count()} "
          f"process {proc_idx}/{proc_cnt}", flush=True)

    trainer = Trainer(cfg, process_index=proc_idx, process_count=proc_cnt)
    ckpt = Checkpointer(os.path.join(workdir, "ckpt"))

    start_epoch, start_batch = 0, 0
    if args.resume:
        state, meta = ckpt.restore(abstract_like(trainer.state))
        if state is not None:
            trainer.state = state
            trainer.step = int(meta["step"])
            start_epoch = int(meta["epoch"])
            start_batch = int(meta["batch_index"]) + 1
            print(f"[train] resumed at step {trainer.step} "
                  f"(epoch {start_epoch}, batch {start_batch})", flush=True)

    eval_corpus = make_corpus(cfg, eval_split=True)
    t_start = time.time()
    t_window, audio_acc = t_start, 0.0
    profiling = False
    session_steps = 0  # steps taken THIS session (resume-safe profiling)
    for epoch in range(start_epoch, cfg.epochs):
        # Materialization + H2D run on a prefetch thread, double-buffered:
        # batch k+1 transfers while batch k computes (VERDICT.md r1 item 5).
        prefetch = DevicePrefetcher(
            trainer.loader.epoch(epoch, start_batch), trainer.put_batch
        )
        try:
            for batch, dev_args in prefetch:
                if args.profile and session_steps == 10 and not profiling:
                    jax.profiler.start_trace(args.profile)
                    profiling = True
                loss, gnorm = trainer.train_batch_device(
                    batch.bucket, dev_args
                )
                session_steps += 1
                m = {
                    "loss": loss,
                    "grad_norm": gnorm,
                    # Global audio seconds: scales the process-local
                    # wav_lens block by process_count (ADVICE r2).
                    "audio_s": trainer.batch_audio_s(batch),
                }
                if profiling and session_steps >= 20:
                    jax.profiler.stop_trace()
                    profiling = False
                    print(f"[train] profiler trace written to {args.profile}")
                # Steps dispatch asynchronously; sync (float()) only at the
                # logging cadence so H2D transfers overlap compute.
                audio_acc += m["audio_s"]
                if trainer.step % cfg.log_every == 0 or trainer.step == 1:
                    now = time.time()
                    logger.log(
                        step=trainer.step,
                        epoch=epoch,
                        bucket=batch.bucket,
                        loss=float(m["loss"]),
                        grad_norm=float(m["grad_norm"]),
                        audio_s=m["audio_s"],
                        audio_s_per_s=audio_acc / max(now - t_window, 1e-9),
                    )
                    t_window, audio_acc = time.time(), 0.0
                if trainer.step % cfg.ckpt_every == 0:
                    ckpt.save(
                        trainer.step,
                        trainer.state,
                        {"step": trainer.step, "epoch": epoch,
                         "batch_index": batch.index, "config": cfg.to_json()},
                    )
        finally:
            # Early exit (error, Ctrl-C) must not leave the producer thread
            # parked on a full queue pinning device buffers.
            prefetch.close()
        start_batch = 0
        if args.eval_every and (epoch + 1) % args.eval_every == 0:
            w = trainer.greedy_wer(eval_corpus)
            logger.log(step=trainer.step, epoch=epoch, eval_greedy_wer=w)

    if profiling:
        jax.profiler.stop_trace()
    w = trainer.greedy_wer(eval_corpus)
    logger.log(step=trainer.step, eval_greedy_wer=w, final=True,
               total_wall_s=time.time() - t_start)
    # Final save marks the run COMPLETE: epoch == cfg.epochs with
    # batch_index -1 makes a later --resume start past the last epoch
    # (no silent partial retrain of epoch N-1, which the round-2 metadata
    # caused).
    ckpt.save(
        trainer.step,
        trainer.state,
        {"step": trainer.step, "epoch": cfg.epochs,
         "batch_index": -1, "config": cfg.to_json()},
    )
    ckpt.close()
    print(f"[train] done: step={trainer.step} eval_greedy_wer={w:.4f}",
          flush=True)


if __name__ == "__main__":
    main()

"""Scaling-efficiency harness (BASELINE.json north_star: ">=85% audio-s/s
efficiency, 1 host -> N hosts"; VERDICT.md round-1 item 5).

Measures steady-state train-step audio-seconds/s under a real
jax.distributed process group and reports the 1-host/N-host table with
per-chip efficiency.  On a TPU pod slice this is one command per host:

    python tools/scaling_bench.py worker --coordinator <host0>:8476 \
        --num-processes N --process-id $i --steps 50

(or plain `worker` with no flags on a TPU pod, where initialize()
autodetects).  Without a pod, `--simulate 1 2 4` runs the same worker
N-process on local CPU with fake devices — that validates the harness and
the collective path end-to-end, but CPU numbers say nothing about ICI;
the table is marked simulated=true.

Output: one JSON line {"hosts": .., "chips": .., "audio_s_per_s": ..,
"per_chip": .., "efficiency_vs_1host": ..} per topology.
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import time


def worker(args) -> None:
    if args.coordinator:
        import jax

        if args.cpu_devices:
            jax.config.update("jax_num_cpu_devices", args.cpu_devices)
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    else:
        import jax

        if args.num_processes > 1 or os.environ.get("TPU_WORKER_HOSTNAMES"):
            jax.distributed.initialize()

    import dataclasses

    import numpy as np
    import jax

    from neuralasr_tpu.configs import PRESETS
    from neuralasr_tpu.data.loader import Batch
    from neuralasr_tpu.parallel.mesh import make_mesh
    from neuralasr_tpu.training import Trainer

    cfg = PRESETS[args.config]
    cfg = dataclasses.replace(
        cfg,
        num_utterances=64,
        batch_size=args.batch * 4,
        specaugment=True,
        cache_dir="",
    )
    if jax.default_backend() != "tpu" and cfg.model.use_pallas_attention:
        # Interpret-mode Pallas would dominate simulated-CPU numbers; the
        # efficiency column only needs the collective path to be real.
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(cfg.model, use_pallas_attention=False),
        )
    n_chips = jax.device_count()
    mesh = make_mesh(n_chips, model_axis=args.model_axis)
    trainer = Trainer(
        cfg,
        mesh=mesh,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )

    sr = cfg.features.sample_rate
    bucket = next(
        i for i, b in enumerate(trainer.buckets)
        if b.max_samples >= args.bucket_seconds * sr
    )
    spec = trainer.buckets[bucket]
    B = spec.batch_size
    assert B % jax.process_count() == 0, (B, jax.process_count())
    rng = np.random.default_rng(0)
    wav = (rng.normal(size=(B, spec.max_samples)) * 1000).astype(np.int16)
    wav_lens = np.full((B,), spec.max_samples, np.int32)
    labels = rng.integers(1, 29, size=(B, spec.max_label_len)).astype(np.int32)
    batch = Batch(
        wav, wav_lens, labels,
        np.full((B,), spec.max_label_len, np.int32),
        np.ones((B,), np.float32), bucket, 0, 0,
    )
    dev_args = trainer.put_batch(batch)

    # Warmup/compile, then steady state.
    trainer.train_batch_device(bucket, dev_args)
    jax.block_until_ready(trainer.state["params"])
    t0 = time.time()
    for _ in range(args.steps):
        trainer.train_batch_device(bucket, dev_args)
    jax.block_until_ready(trainer.state["params"])
    dt = (time.time() - t0) / args.steps

    audio_s = float(wav_lens.sum()) / sr  # global batch audio per step
    result = {
        "hosts": jax.process_count(),
        "chips": n_chips,
        "audio_s_per_s": round(audio_s / dt, 2),
        "per_chip": round(audio_s / dt / n_chips, 2),
        "step_ms": round(dt * 1e3, 2),
        "batch": B,
        "backend": jax.default_backend(),
    }
    if jax.process_index() == 0:
        if args.out:
            with open(args.out, "w") as fh:
                json.dump(result, fh)
        print(json.dumps(result), flush=True)


def simulate(args) -> None:
    """Local CPU multi-process runs of the worker at each host count."""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # axon sitecustomize off
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    total_devices = max(args.simulate)
    rows = []
    for nproc in args.simulate:
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        ndev = total_devices // nproc
        out = f"/tmp/scaling_{nproc}.json"
        procs = [
            subprocess.Popen(
                [
                    sys.executable, os.path.abspath(__file__), "worker",
                    "--coordinator", f"localhost:{port}",
                    "--num-processes", str(nproc), "--process-id", str(i),
                    "--cpu-devices", str(ndev), "--steps", str(args.steps),
                    "--config", args.config, "--batch", str(args.batch),
                    "--bucket-seconds", str(args.bucket_seconds),
                    "--out", out,
                ],
                env=env,
            )
            for i in range(nproc)
        ]
        for p in procs:
            assert p.wait(timeout=900) == 0, f"worker failed at nproc={nproc}"
        with open(out) as fh:
            rows.append(json.load(fh))
    base = rows[0]["per_chip"]
    for r in rows:
        r["simulated"] = True
        r["efficiency_vs_1host"] = round(r["per_chip"] / base, 3)
        print(json.dumps(r))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("mode", nargs="?", default="simulate",
                   choices=["worker", "simulate"])
    p.add_argument("--coordinator", default=None)
    p.add_argument("--num-processes", type=int, default=1)
    p.add_argument("--process-id", type=int, default=0)
    p.add_argument("--cpu-devices", type=int, default=0,
                   help="fake CPU devices per process (simulation)")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--config", default="tiny")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--bucket-seconds", type=float, default=3.0)
    p.add_argument("--model-axis", type=int, default=1)
    p.add_argument("--out", default=None)
    p.add_argument("--simulate", type=int, nargs="+", default=[1, 2, 4],
                   help="host counts to simulate locally on CPU")
    args = p.parse_args()
    if args.mode == "worker":
        worker(args)
    else:
        simulate(args)


if __name__ == "__main__":
    main()

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
    if args.pin_core is not None and args.pin_core >= 0 and hasattr(
        os, "sched_setaffinity"
    ):
        # Simulated multi-host on a small box: pin each worker to its own
        # core so the efficiency column measures the collective path, not
        # scheduler fairness (VERDICT r4 weak 3 — the unpinned 4-process
        # run on 2 cores published oversubscription noise).
        os.sched_setaffinity(0, {args.pin_core % os.cpu_count()})
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

    # Warmup/compile (several steps: the first also pays gloo connection
    # setup and allocator growth), then steady state.
    for _ in range(max(1, args.warmup)):
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
    """Local CPU multi-process runs of the worker at each host count.

    Methodology (VERDICT r4 weak 3 — the round-4 harness published a
    4-process 0.849 'efficiency' on a 2-core box, which measured
    oversubscription, not collectives):
    - each simulated host is pinned to its own core, and the total fake
      device count never exceeds the core count, so 1 host x N devices
      and N hosts x 1 device contend for the SAME cycles;
    - host counts beyond the core count still run (they validate the
      multi-process collective path) but publish efficiency=None with an
      explicit oversubscribed flag instead of a meaningless number;
    - several warmup steps (gloo setup, allocator growth) precede the
      timed window.
    CPU numbers still say nothing about ICI; simulated=true on every row
    and BASELINE.md carries the analytic ICI model next to this table.
    """
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # axon sitecustomize off
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    ncores = os.cpu_count() or 1
    supported = [n for n in args.simulate if n <= ncores]
    total_devices = min(max(supported or [1]), ncores)
    rows = []
    for nproc in args.simulate:
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        ndev = max(total_devices // nproc, 1)
        out = f"/tmp/scaling_{nproc}.json"
        procs = [
            subprocess.Popen(
                [
                    sys.executable, os.path.abspath(__file__), "worker",
                    "--coordinator", f"localhost:{port}",
                    "--num-processes", str(nproc), "--process-id", str(i),
                    "--cpu-devices", str(ndev), "--steps", str(args.steps),
                    "--warmup", str(args.warmup),
                    "--config", args.config, "--batch", str(args.batch),
                    "--bucket-seconds", str(args.bucket_seconds),
                    "--out", out,
                ]
                + (["--pin-core", str(i)] if nproc > 1 else []),
                env=env,
            )
            for i in range(nproc)
        ]
        for p in procs:
            assert p.wait(timeout=1800) == 0, f"worker failed at nproc={nproc}"
        with open(out) as fh:
            rows.append(json.load(fh))
    # Control: the same worker count, same pinning, but INDEPENDENT
    # processes (no jax.distributed, no psum).  Any deficit the control
    # shows versus the 1-host row is host-side scheduling (in-process XLA
    # threads beat pinned cross-process workers on a small box), NOT
    # collective cost; the distributed-vs-control delta is the isolated
    # collective overhead — the only quantity this box can say anything
    # about (ICI needs a pod).
    controls = {}
    for nproc in [n for n in args.simulate if 1 < n <= ncores]:
        outs = [f"/tmp/scaling_ctl_{nproc}_{i}.json" for i in range(nproc)]
        procs = [
            subprocess.Popen(
                [
                    sys.executable, os.path.abspath(__file__), "worker",
                    "--num-processes", "1", "--process-id", "0",
                    "--cpu-devices", "1", "--steps", str(args.steps),
                    "--warmup", str(args.warmup),
                    "--config", args.config, "--batch", str(args.batch),
                    "--bucket-seconds", str(args.bucket_seconds),
                    "--out", outs[i], "--pin-core", str(i),
                ],
                env=env,
            )
            for i in range(nproc)
        ]
        for p in procs:
            assert p.wait(timeout=1800) == 0, f"control failed at {nproc}"
        per = []
        for o in outs:
            with open(o) as fh:
                per.append(json.load(fh)["per_chip"])
        controls[nproc] = sum(per) / len(per)

    base = next((r for r in rows if r["hosts"] == 1), rows[0])["per_chip"]
    for r in rows:
        r["simulated"] = True
        if r["hosts"] <= ncores and r["chips"] <= ncores:
            r["efficiency_vs_1host"] = round(r["per_chip"] / base, 3)
            ctl = controls.get(r["hosts"])
            if ctl:
                r["control_independent_per_chip"] = round(ctl, 2)
                r["collective_overhead_vs_control"] = round(
                    1.0 - r["per_chip"] / ctl, 3
                )
        else:
            r["efficiency_vs_1host"] = None
            r["oversubscribed"] = (
                f"{r['hosts']} hosts x {r['chips'] // r['hosts']} dev on "
                f"{ncores} cores: collective-path validation only"
            )
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
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--pin-core", type=int, default=None,
                   help="pin this worker to one core (simulation only)")
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

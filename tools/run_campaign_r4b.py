"""Round-4 campaign B: fresh-train the ladder under the shipped defaults,
with confidence intervals, a drift root-cause experiment, and the measured
headline collapse row (VERDICT r3 items 4 and 7).

One process = one axon chip claim.  Stages:

  train      configs base/conv/fusion/conformer FROM SCRATCH (fresh seeds
             of the r4 stack: attention dispatch policy, framed frontend,
             current defaults) into runs/{cfg}_r4.
  evals      standard + stress protocols at 512 utts with bootstrap 95%
             CIs (now emitted by evaluate.py); fusion ablates the LM; conv
             and conformer additionally re-eval with --eval-seed-offset 7
             (disjoint eval utterances) to measure protocol variance
             directly.
  drift      round 3's open question: does a ~166-step LR-tail partial
             epoch move stress WER on a FRESH checkpoint, or was the r3
             +4 pp conv drift protocol variance?  Copy conv_r4, resume
             with --epochs 21 (exactly one extra epoch at the decayed LR —
             the same step count as the r3 resume event), re-eval stress.
  sweep      WER-vs-formant-shift curves on the fresh checkpoints.
  bench      headline bench row with --ckpt runs/conformer_r4: the
             measured (real-emissions) collapsed-beam numbers at the
             headline config.
  gates      derive new gates = fresh beam WER + 2x the CI half-width,
             written to runs/ladder_r4_gates.json (then baked into
             tools/run_ladder.py).

Usage: python tools/run_campaign_r4b.py [stage ...]   (default: all)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neuralasr_tpu.cli import evaluate as eval_cli
from neuralasr_tpu.cli import train as train_cli
from tools.run_campaign2 import bench_once
from tools.run_ladder import STRESS, run

CONFIGS = ["base", "conv", "fusion", "conformer"]
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def wd(cfg, suffix="_r4"):
    return f"runs/{cfg}{suffix}"


def stage_attn_g16():
    """Re-measure the (64,240) attention point with the G<=16 fold list."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    import tools.run_campaign_r4 as a
    from neuralasr_tpu.ops.pallas_attention import (
        flash_attention_local_rope, rope_tables,
    )

    H, D = 6, 64
    B, T = 64, 240
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(
        rng.normal(size=(B, T, H, D)).astype(np.float32)
    ).astype(jnp.bfloat16)
    q, k, v = mk(), mk(), mk()
    lens = jnp.asarray(rng.integers(T // 2, T + 1, size=(B,)), jnp.int32)
    cos, sin = rope_tables(T, D)

    def stack(qq, kk, vv):
        x = qq
        for _ in range(12):
            x = flash_attention_local_rope(x, kk, vv, lens, cos, sin) + qq
        return x

    def stack_loss(qq, kk, vv):
        return stack(qq, kk, vv).astype(jnp.float32).sum()

    row = {"B": B, "T": T, "impl": "pallas_g16", "nstack": 12}
    row["fwd_ms_per_call"] = round(
        a.timeit_chain(jax.jit(stack), (q, k, v), 20) / 12 * 1e3, 4
    )
    row["fwdbwd_ms_per_call"] = round(
        a.timeit_chain(
            jax.jit(jax.value_and_grad(stack_loss, argnums=(0,))),
            (q, k, v), 20,
        ) / 12 * 1e3, 4
    )
    print(f"[g16] {row}", flush=True)
    with open("runs/attn_g16_r4.json", "w") as fh:
        json.dump(row, fh)
    return row


def stage_train():
    for cfg in CONFIGS:
        run(train_cli,
            ["train.py", "--config", cfg, "--workdir", wd(cfg)])


def stage_evals(failures):
    for cfg in CONFIGS:
        ev = ["evaluate.py", "--config", cfg, "--workdir", wd(cfg),
              "--max-utts", "512"]
        run(eval_cli, ev, f"runs/{cfg}_r4.eval.json", failures=failures)
        run(eval_cli, ev + STRESS, f"runs/{cfg}_r4.eval_stress.json",
            failures=failures)
        if cfg == "fusion":
            run(eval_cli, ev + STRESS + ["--lm-weight", "0"],
                f"runs/{cfg}_r4.eval_stress_nolm.json", failures=failures)
        if cfg in ("conv", "conformer"):
            # Disjoint-seed re-eval: same checkpoint, different 512 eval
            # utterances — the difference IS protocol variance.
            run(eval_cli, ev + STRESS + ["--eval-seed-offset", "7"],
                f"runs/{cfg}_r4.eval_stress_seed7.json", failures=failures)
        if cfg == "base":
            run(eval_cli, ev + ["--eval-seed-offset", "7"],
                f"runs/{cfg}_r4.eval_seed7.json", failures=failures)


def stage_drift(failures):
    src, dst = wd("conv"), wd("conv", "_r4_drift")
    if os.path.exists(dst):
        shutil.rmtree(dst)
    shutil.copytree(src, dst)
    # One extra epoch at the fully-decayed LR = the r3 resume event
    # (~166 steps for conv) on a FRESH checkpoint.
    run(train_cli,
        ["train.py", "--config", "conv", "--workdir", dst, "--resume",
         "--epochs", "21"])
    ev = ["evaluate.py", "--config", "conv", "--workdir", dst,
          "--max-utts", "512"]
    run(eval_cli, ev + STRESS, "runs/conv_r4_drift.eval_stress.json",
        failures=failures)
    run(eval_cli, ev + STRESS + ["--eval-seed-offset", "7"],
        "runs/conv_r4_drift.eval_stress_seed7.json", failures=failures)


def stage_sweep():
    from tools.run_ladder import SWEEP_SHIFTS

    for cfg in ("conv", "fusion", "conformer"):
        out = f"runs/{cfg}_r4_shift_sweep.jsonl"
        with open(out, "w"):
            pass
        for shift in SWEEP_SHIFTS:
            run(eval_cli,
                ["evaluate.py", "--config", cfg, "--workdir", wd(cfg),
                 "--max-utts", "128", "--eval-noise", "1.0",
                 "--eval-shift", str(shift)],
                "runs/_sweep_tmp.json")
            with open("runs/_sweep_tmp.json") as fh, open(out, "a") as o:
                o.write(fh.read())
        print(f"== sweep written: {out}", flush=True)


def stage_bench():
    # Measured collapse at the headline config on the FRESH flagship
    # checkpoint (replaces the simulated headline row, VERDICT r3 item 7).
    return bench_once("r4b_headline_ckpt", ["--ckpt", wd("conformer")])


def stage_gates():
    gates = {}
    for cfg in CONFIGS:
        proto = "eval" if cfg == "base" else "eval_stress"
        path = f"runs/{cfg}_r4.{proto}.json"
        try:
            with open(path) as fh:
                rec = json.loads(fh.read().strip().splitlines()[-1])
            w = rec.get("beam_wer", rec["greedy_wer"])
            ci = rec.get("beam_wer_ci95") or rec.get("greedy_wer_ci95")
            half = (ci[1] - ci[0]) / 2 if ci else 0.02
            gates[cfg] = {
                "protocol": "standard" if proto == "eval" else "stress",
                "wer": w,
                "ci95": ci,
                "gate": round(w + 2 * half, 4),
            }
        except Exception:
            gates[cfg] = {"error": traceback.format_exc()[-300:]}
    with open("runs/ladder_r4_gates.json", "w") as fh:
        json.dump(gates, fh, indent=2)
    print(json.dumps(gates, indent=2), flush=True)
    return gates


def main():
    os.chdir(REPO)
    stages = sys.argv[1:] or [
        "pre", "train", "evals", "drift", "sweep", "bench", "gates",
    ]
    failures: list[str] = []
    errors = []
    t0 = time.time()
    for st in stages:
        print(f"==== stage {st} ({time.time() - t0:.0f}s) ====", flush=True)
        try:
            if st == "pre":
                bench_once("r4b_ctc_stream", ["--ctc-impl", "pallas_stream"])
                stage_attn_g16()
            elif st == "train":
                stage_train()
            elif st == "evals":
                stage_evals(failures)
            elif st == "drift":
                stage_drift(failures)
            elif st == "sweep":
                stage_sweep()
            elif st == "bench":
                stage_bench()
            elif st == "gates":
                stage_gates()
        except Exception:
            errors.append((st, traceback.format_exc()[-1500:]))
            print(f"[campaign] stage {st} FAILED", flush=True)
    print(json.dumps({"eval_failures": failures, "stage_errors": errors}),
          flush=True)
    print("CAMPAIGN-R4B-DONE", flush=True)


if __name__ == "__main__":
    main()

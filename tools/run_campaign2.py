"""Round-3 follow-up TPU campaign (one process, one chip claim).

Covers what the main campaign could not: the FIXED framing-fused Pallas
frontend (the first attempt hit a Mosaic lane-concat limit and fell back
to conv), the Pallas CTC kernel A/B, the headline bench with the measured
defaults locked in (batch 64, allpairs beam merge), a batch-128 mfu probe,
the measured-collapse rerun, and the compile-prewarmed 100k-corpus train
measurement.

    python tools/run_campaign2.py
"""

import contextlib
import io
import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.run_campaign import preflight_framed_frontend


def bench_once(name, argv):
    import bench

    print(f"== bench2 variant: {name}", flush=True)
    old = sys.argv
    sys.argv = ["bench.py"] + argv
    buf = io.StringIO()
    try:
        with contextlib.redirect_stdout(buf):
            bench.main()
        rec = json.loads(buf.getvalue().strip().splitlines()[-1])
        rec["variant"] = name
    except Exception:
        rec = {"variant": name, "error": traceback.format_exc()[-500:]}
    finally:
        sys.argv = old
    with open("runs/bench_suite.jsonl", "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    print(json.dumps({k: rec.get(k) for k in
                      ("variant", "value", "mfu", "train_step_ms",
                       "beam16_audio_s_per_s_per_chip", "error")}),
          flush=True)
    return rec


def preflight_pallas_ctc() -> bool:
    """Compile+run the Pallas CTC fwd+bwd on the live backend."""
    try:
        import numpy as np
        import jax
        import jax.numpy as jnp

        from neuralasr_tpu.ctc.loss import ctc_loss

        rng = np.random.default_rng(0)
        B, T, V, L = 8, 64, 30, 24
        logits = jnp.asarray(rng.normal(size=(B, T, V)), jnp.float32)
        labels = jnp.asarray(rng.integers(1, V, size=(B, L)), jnp.int32)
        il = jnp.full((B,), T, jnp.int32)
        ll = jnp.full((B,), L, jnp.int32)

        def f(lg):
            per = ctc_loss(lg, labels, il, ll, impl="pallas")
            return jnp.where(per > 1e29, 0.0, per).sum()

        v, g = jax.jit(jax.value_and_grad(f))(logits)
        jax.block_until_ready(g)
        per_scan = ctc_loss(logits, labels, il, ll, impl="scan")
        want = float(jnp.where(per_scan > 1e29, 0.0, per_scan).sum())
        ok = (
            np.isfinite(np.asarray(g)).all()
            and abs(float(v) - want) < 1e-2 * max(1.0, abs(want))
        )
        print(f"[campaign2] pallas-ctc preflight: ok={ok} "
              f"v={float(v):.3f} want={want:.3f}", flush=True)
        return bool(ok)
    except Exception:
        print("[campaign2] pallas-ctc preflight FAILED:\n"
              + traceback.format_exc()[-600:], flush=True)
        return False


def main():
    framed_ok = preflight_framed_frontend()
    ctc_ok = preflight_pallas_ctc()
    fe = [] if framed_ok else ["--frontend", "conv"]

    bench_once("r3b_conformer_default", fe)
    if framed_ok:
        bench_once("r3b_frontend_conv_ab", ["--frontend", "conv"])
    if ctc_ok:
        bench_once("r3b_ctc_pallas", fe + ["--ctc-impl", "pallas"])
    bench_once("r3b_batch128", fe + ["--batch", "128", "--no-breakdown"])
    bench_once("r3b_ckpt_collapse", fe + ["--ckpt", "runs/conformer_r2",
                                          "--no-breakdown"])

    # Ladder remainder: the first campaign aborted at conv's tripped stress
    # gate (the old ladder runner re-raised instead of recording), so
    # fusion/conformer evals and the shift sweep never ran; conv's gated
    # stress eval JSON was also lost.  run_ladder now records failures and
    # finishes everything.
    try:
        from tools import run_ladder

        gate_failures = run_ladder.ladder(
            ["conv", "fusion", "conformer"], sweep=True
        )
        if gate_failures:
            print(json.dumps({"gate_failures": gate_failures}), flush=True)
    except Exception:
        print("[campaign2] ladder stage FAILED:\n"
              + traceback.format_exc()[-800:], flush=True)

    # Compile-prewarmed 100k-corpus train-step measurement.
    try:
        from tools import corpus_scale

        old = sys.argv
        sys.argv = ["corpus_scale.py", "--utts", "100000", "--dir",
                    "runs/corpus_100k", "--batches", "100",
                    "--train-steps", "200"]
        try:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                corpus_scale.main()
            line = buf.getvalue().strip().splitlines()[-1]
            with open("runs/corpus_scale_100k_tpu.json", "w") as fh:
                fh.write(line + "\n")
            print(line, flush=True)
        finally:
            sys.argv = old
    except Exception:
        print("[campaign2] corpus stage FAILED:\n"
              + traceback.format_exc()[-600:], flush=True)

    print("CAMPAIGN2-DONE", flush=True)


if __name__ == "__main__":
    main()

"""Round TPU campaign: EVERYTHING chip-bound in ONE process.

The axon tunnel refuses new clients for 10-35 minutes after any TPU process
exits (BASELINE.md environment note), so the whole round's TPU work — bench
suite, measured-collapse bench, 100k-corpus train steps, WER ladder with
recorded gates, shift sweep — runs as one process, one chip claim.

    python tools/run_campaign.py [bench] [corpus] [ladder] [sweep]

No args = all stages.  Each stage's artifacts land in runs/ as usual.
"""

import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def preflight_framed_frontend() -> bool:
    """Compile+run the framing-fused Pallas kernel on the live backend with
    bench-like shapes.  False -> the bench stage falls back to the conv
    frontend instead of dying mid-campaign (each TPU process exit wedges
    the axon tunnel for 10-35 min, so in-process fallback beats retry)."""
    try:
        import numpy as np
        import jax
        import jax.numpy as jnp

        from neuralasr_tpu.features.frontend import (
            LOG_FLOOR, _dft_matrices, mel_filterbank,
        )
        from neuralasr_tpu.ops.pallas_frontend import fused_frontend_framed

        window = np.hamming(400)
        C, S = _dft_matrices(400, 512)
        wdft = jnp.asarray(
            np.concatenate([window[:, None] * C, window[:, None] * S], 1),
            jnp.bfloat16,
        )
        fb = jnp.asarray(mel_filterbank(80, 512, 16000), jnp.float32)
        post = jnp.eye(80, dtype=jnp.float32)
        y = jnp.asarray(
            np.random.default_rng(0).normal(size=(2, 160000)), jnp.bfloat16
        )
        out = fused_frontend_framed(
            y, 512, wdft, fb, post, 512, LOG_FLOOR, 160, 400
        )
        jax.block_until_ready(out)
        ok = bool(np.isfinite(np.asarray(out)).all())
        print(f"[campaign] framed-frontend preflight: ok={ok}", flush=True)
        return ok
    except Exception:
        print("[campaign] framed-frontend preflight FAILED:\n"
              + traceback.format_exc()[-600:], flush=True)
        return False


def stage_bench():
    from tools import bench_suite

    default_args = () if preflight_framed_frontend() else (
        "--frontend", "conv",
    )
    bench_suite.main(default_args)


def stage_corpus():
    """Conformer train steps through the 100k packed corpus on the chip."""
    from tools import corpus_scale

    old = sys.argv
    sys.argv = ["corpus_scale.py", "--utts", "100000", "--dir",
                "runs/corpus_100k", "--batches", "100",
                "--train-steps", "200"]
    try:
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            corpus_scale.main()
        line = buf.getvalue().strip().splitlines()[-1]
        with open("runs/corpus_scale_100k_tpu.json", "w") as fh:
            fh.write(line + "\n")
        print(line, flush=True)
    finally:
        sys.argv = old


def stage_ladder(sweep=False):
    from tools import run_ladder

    run_ladder.ladder(["base", "conv", "fusion", "conformer"], sweep=sweep)


def main():
    stages = [a for a in sys.argv[1:]] or ["bench", "corpus", "ladder",
                                           "sweep"]
    failures = []
    if "bench" in stages:
        try:
            stage_bench()
        except Exception:
            failures.append(("bench", traceback.format_exc()[-800:]))
    if "corpus" in stages:
        try:
            stage_corpus()
        except Exception:
            failures.append(("corpus", traceback.format_exc()[-800:]))
    if "ladder" in stages or "sweep" in stages:
        try:
            stage_ladder(sweep="sweep" in stages)
        except Exception:
            failures.append(("ladder", traceback.format_exc()[-800:]))
    if failures:
        print(json.dumps({"campaign_failures": failures}), flush=True)
        sys.exit(1)
    print("CAMPAIGN-DONE", flush=True)


if __name__ == "__main__":
    main()

"""Run several bench.py variants in ONE process (one axon chip claim) and
append their JSON lines to runs/bench_suite.jsonl.

Variants: flagship default; partitioned-attention A/B; frontend
gather/conv A/B; BiLSTM path (plain / unroll 16 / frame-stack 3); batch 64.
"""

import contextlib
import io
import json
import sys
import traceback

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench


VARIANTS = [
    # Flagship: batch 64 bf16 + framed Pallas frontend is now the default.
    ("conformer_default", []),
    ("conformer_batch32", ["--batch", "32"]),  # round-2 comparison point
    ("conformer_frontend_gather", ["--frontend", "gather"]),
    ("conformer_frontend_conv", ["--frontend", "conv"]),
    ("conformer_partitioned_attn", ["--partition-attention"]),
    # Measured (non-simulated) blank-collapse rows on the trained ckpt.
    ("conformer_ckpt_collapse", ["--ckpt", "runs/conformer_r2",
                                 "--no-breakdown"]),
    # Beam merge A/B at widths 16 and 64 (VERDICT r2 item 10).
    ("conformer_beam16_allpairs", ["--beam-merge", "allpairs",
                                   "--no-breakdown"]),
    ("conformer_beam64_sort", ["--beam-width", "64", "--no-breakdown"]),
    ("conformer_beam64_allpairs", ["--beam-width", "64", "--beam-merge",
                                   "allpairs", "--no-breakdown"]),
    # BiLSTM family: fused-scan A/B (VERDICT r2 item 3) + round-2 rows.
    ("bilstm_default", ["--model", "bilstm4x512", "--no-breakdown"]),
    ("bilstm_fused", ["--model", "bilstm4x512", "--fused-scan",
                      "--no-breakdown"]),
    ("bilstm_framestack3", ["--model", "bilstm4x512", "--frame-stack", "3",
                            "--no-breakdown"]),
    ("bilstm_fused_framestack3", ["--model", "bilstm4x512", "--fused-scan",
                                  "--frame-stack", "3", "--no-breakdown"]),
]


def main(default_args=()):
    """default_args: appended to every variant (e.g. ['--frontend', 'conv']
    when the campaign preflight found the framed Pallas kernel unbuildable
    on this backend).  Explicit per-variant flags win (argparse last-wins
    doesn't apply across different flags, so defaults go FIRST)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = os.path.join(repo, "runs", "bench_suite.jsonl")
    for name, argv in VARIANTS:
        print(f"== bench variant: {name}", flush=True)
        old = sys.argv
        sys.argv = ["bench.py"] + list(default_args) + argv
        buf = io.StringIO()
        try:
            with contextlib.redirect_stdout(buf):
                bench.main()
            line = buf.getvalue().strip().splitlines()[-1]
            rec = json.loads(line)
            rec["variant"] = name
        except Exception:
            rec = {"variant": name, "error": traceback.format_exc()[-500:]}
        finally:
            sys.argv = old
        with open(out_path, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        print(json.dumps({k: rec.get(k) for k in
                          ("variant", "value", "mfu", "train_step_ms",
                           "decode_audio_s_per_s_per_chip", "error")}),
              flush=True)
    print("BENCH-SUITE-DONE", flush=True)


if __name__ == "__main__":
    main()

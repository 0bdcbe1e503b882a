"""Round-3 defaults-proving TPU campaign (short; one chip claim).

Proves the two kernels fixed/blocked after campaign 2 launched, so the
driver's end-of-round `python bench.py` can run the best configuration as
the DEFAULT without risk:

  - framing-fused Pallas frontend with the HBM-pinned rows input
  - blocked (8-frames/program) Pallas CTC kernels

Benches default / framed / pallas-ctc / combined, then prints a
recommendation line for which defaults to lock in.

    python tools/run_campaign3.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.run_campaign import preflight_framed_frontend
from tools.run_campaign2 import bench_once, preflight_pallas_ctc


def main():
    framed_ok = preflight_framed_frontend()
    ctc_ok = preflight_pallas_ctc()
    fe = [] if framed_ok else ["--frontend", "conv"]

    rows = {}
    rows["base"] = bench_once("r3c_conv_scan", ["--frontend", "conv"])
    if framed_ok:
        rows["framed"] = bench_once("r3c_framed_scan", [])
    if ctc_ok:
        rows["ctc"] = bench_once("r3c_ctc_blocked", fe + ["--ctc-impl",
                                                          "pallas"])
    if framed_ok and ctc_ok:
        rows["both"] = bench_once(
            "r3c_framed_ctc", ["--ctc-impl", "pallas"]
        )
        rows["both_b128"] = bench_once(
            "r3c_framed_ctc_b128",
            ["--ctc-impl", "pallas", "--batch", "128", "--no-breakdown"],
        )

    # base_fs3: train + eval the frame-stacked config-2 preset to prove the
    # 3.2x-throughput variant WER-neutral at the full ladder protocol
    # (VERDICT r2 item 3's "flip if WER-neutral", done as a new preset so
    # the recorded `base` checkpoints/gates stay valid).
    try:
        from tools.run_ladder import STRESS, run
        from neuralasr_tpu.cli import evaluate as eval_cli
        from neuralasr_tpu.cli import train as train_cli

        wd = "runs/base_fs3_r3"
        run(train_cli, ["train.py", "--config", "base_fs3", "--workdir", wd,
                        "--resume"])
        ev = ["evaluate.py", "--config", "base_fs3", "--workdir", wd,
              "--max-utts", "512"]
        run(eval_cli, ev, f"{wd}.eval.json")
        run(eval_cli, ev + STRESS, f"{wd}.eval_stress.json")
    except Exception:
        import traceback as tb

        print("[campaign3] base_fs3 stage FAILED:\n" + tb.format_exc()[-600:],
              flush=True)

    def val(r):
        return r.get("value") or 0 if r and not r.get("error") else 0

    best = max(rows, key=lambda k: val(rows[k]))
    print(json.dumps({
        "recommendation": {
            "framed_frontend_ok": framed_ok,
            "pallas_ctc_ok": ctc_ok,
            "best_variant": best,
            "values": {k: val(r) for k, r in rows.items()},
        }
    }), flush=True)
    print("CAMPAIGN3-DONE", flush=True)


if __name__ == "__main__":
    main()

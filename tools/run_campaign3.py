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

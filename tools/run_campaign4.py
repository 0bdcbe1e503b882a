"""Round-3 final TPU check: the tile-aligned framing-fused frontend.

If the preflight passes, bench it as the default (plus a batch-128 row)
and leave `bench.py --frontend pallas` as the shipping default; if it
still fails, the caller must flip bench's default frontend to conv before
round end (the driver runs plain `python bench.py`).

    python tools/run_campaign4.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.run_campaign import preflight_framed_frontend
from tools.run_campaign2 import bench_once


def main():
    framed_ok = preflight_framed_frontend()
    rows = {}
    if framed_ok:
        rows["framed"] = bench_once("r3d_framed_default", [])
        rows["framed_b128"] = bench_once(
            "r3d_framed_b128", ["--batch", "128", "--no-breakdown"]
        )
        rows["framed_b128_ctc"] = bench_once(
            "r3d_framed_b128_ctc",
            ["--batch", "128", "--ctc-impl", "pallas", "--no-breakdown"],
        )
    print(json.dumps({"framed_frontend_ok": framed_ok,
                      "values": {k: r.get("value") for k, r in rows.items()},
                      "mfu": {k: r.get("mfu") for k, r in rows.items()}}),
          flush=True)
    print("CAMPAIGN4-DONE", flush=True)


if __name__ == "__main__":
    main()

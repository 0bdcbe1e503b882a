"""Round-5 campaign B: conv-kernel fold probing (one process = one chip
claim).

The r5a trace showed the fused conv module at 8.8 ms/step with Gb=1 —
64 grid programs x 24 per-layer calls = ~1536 programs/step, i.e.
dispatch-bound like round 3's G=1 attention.  This campaign forces larger
folds via NEURALASR_CONV_GB (the conservative VMEM charge only admits
Gb=1), checks compile+parity on silicon FIRST (preflight), then takes a
step-level bench row per viable fold, and re-traces the best.

Usage: python tools/run_campaign_r5b.py
"""

from __future__ import annotations

import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.run_campaign2 import bench_once
from tools.run_campaign_r5 import BASE, _trace

RUNS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "runs"
)


def main():
    results = {}
    best = (None, None)  # (gb, value)
    for gb in (2, 4, 8):
        os.environ["NEURALASR_CONV_GB"] = str(gb)
        try:
            from neuralasr_tpu.utils.preflight import preflight_conv_module

            pf = preflight_conv_module()
            ok = all(v.get("ok") for v in pf.values())
            results[f"gb{gb}_preflight"] = pf
            if not ok:
                print(f"[r5b] Gb={gb} preflight failed; skipping bench",
                      flush=True)
                continue
        except Exception:
            print(f"[r5b] Gb={gb} preflight crashed:\n"
                  + traceback.format_exc()[-800:], flush=True)
            continue
        rec = bench_once(
            f"r5b_packed_convpallas_gb{gb}",
            BASE + ["--attn-impl", "packed", "--conv-impl", "pallas"],
        )
        v = rec.get("value")
        results[f"gb{gb}_bench"] = {
            k: rec.get(k) for k in ("value", "mfu", "train_step_ms")
        }
        if v and (best[1] is None or v > best[1]):
            best = (gb, v)
    with open(os.path.join(RUNS, "conv_gb_probe_r5.json"), "w") as f:
        json.dump({"results": results, "best_gb": best[0]}, f, indent=1)
    if best[0] is not None:
        os.environ["NEURALASR_CONV_GB"] = str(best[0])
        _trace(f"r5b_convgb{best[0]}",
               ["--attn-impl", "packed", "--conv-impl", "pallas"])
    os.environ.pop("NEURALASR_CONV_GB", None)
    print("CAMPAIGN-R5B-DONE best_gb=", best[0], flush=True)


if __name__ == "__main__":
    main()

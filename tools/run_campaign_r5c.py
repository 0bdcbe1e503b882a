"""Round-5 campaign C (one process = one axon chip claim).

Stages, in order:

  preflight  compile+parity of every Pallas kernel family on the live
             chip under the ROUND-5 SHIPPED DEFAULTS (packed attention,
             fused conv module now batch-axis custom_partitioned, split
             fwd/bwd conv fold plans) — runs/preflight_r5c.json.
  convgb     conv-module fold probe (the r5a trace showed the Gb=1
             kernel dispatch-bound at ~1500 grid programs/step): for
             each (fwd Gb, bwd Gb) combo, silicon preflight FIRST, then
             a step-level bench row.  runs/conv_gb_probe_r5.json.
  ladder     FRESH from-scratch WER ladder (configs 2-5) under the r5
             stack, incl. blank-collapse WER-equality evals and the
             shift sweep (tools/run_ladder.py; VERDICT r4 items 5/7).
  headline   bench rows at shipped defaults: synthetic full-length
             headline + --ckpt runs/conformer_r5 (REAL-emission
             collapse crop, beam16_e2e ms — the <30 ms target row).
  trace      encoder_trace attribution at the final settings.

Usage: python tools/run_campaign_r5c.py [stage ...]   (default: all)
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


def stage_preflight():
    from neuralasr_tpu.utils.preflight import run_preflight

    res = run_preflight()
    with open(os.path.join(RUNS, "preflight_r5c.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps({"preflight_all_ok": res["all_ok"]}), flush=True)
    return res["all_ok"]


def _set_gb(fwd, bwd):
    import jax

    for k in ("NEURALASR_CONV_GB", "NEURALASR_CONV_GB_FWD",
              "NEURALASR_CONV_GB_BWD"):
        os.environ.pop(k, None)
    if fwd is not None:
        os.environ["NEURALASR_CONV_GB_FWD"] = str(fwd)
    if bwd is not None:
        os.environ["NEURALASR_CONV_GB_BWD"] = str(bwd)
    # Gb is read at TRACE time; stale jit caches would silently reuse the
    # previous fold.
    jax.clear_caches()


def stage_convgb():
    from neuralasr_tpu.utils.preflight import preflight_conv_module

    results = {}
    best = (None, None, None)  # (fwd, bwd, value)
    # (2,1) is the new auto plan (fwd folds to its own ~8-row charge);
    # larger combos probe past the conservative VMEM charge.
    for fwd, bwd in ((1, 1), (2, 1), (4, 1), (2, 2), (4, 2), (8, 1)):
        tag = f"fwd{fwd}_bwd{bwd}"
        _set_gb(fwd, bwd)
        try:
            pf = preflight_conv_module()
            ok = all(v.get("ok") for v in pf.values())
            results[f"{tag}_preflight"] = pf
            if not ok:
                print(f"[r5c] {tag} preflight failed; skipping bench",
                      flush=True)
                continue
        except Exception:
            results[f"{tag}_preflight"] = {"crash": traceback.format_exc()[-600:]}
            print(f"[r5c] {tag} preflight crashed", flush=True)
            continue
        rec = bench_once(f"r5c_conv_{tag}", BASE)
        v = rec.get("value")
        results[f"{tag}_bench"] = {
            k: rec.get(k) for k in ("value", "mfu", "train_step_ms")
        }
        if v and (best[2] is None or v > best[2]):
            best = (fwd, bwd, v)
    _set_gb(None, None)
    with open(os.path.join(RUNS, "conv_gb_probe_r5.json"), "w") as f:
        json.dump(
            {"results": results, "best": {"fwd": best[0], "bwd": best[1]}},
            f, indent=1,
        )
    print(f"[r5c] convgb best fwd={best[0]} bwd={best[1]} v={best[2]}",
          flush=True)
    return best


def stage_ladder():
    from tools.run_ladder import ladder

    return ladder(["base", "conv", "fusion", "conformer"], sweep=True,
                  round_tag="r5")


def stage_headline(best=None):
    if best and best[0] is not None:
        _set_gb(best[0], best[1])
    bench_once("r5c_headline", BASE)
    # REAL-emission rows on the fresh flagship checkpoint: collapse crop,
    # beam16_e2e ms (the <30 ms plan), measured keep fraction.
    ck = os.path.join(RUNS, "conformer_r5")
    if os.path.isdir(os.path.join(ck, "ckpt")):
        bench_once("r5c_headline_ckpt", BASE + ["--ckpt", ck])
    else:
        print("[r5c] no conformer_r5 checkpoint; skipping ckpt row",
              flush=True)


def stage_trace(best=None):
    if best and best[0] is not None:
        _set_gb(best[0], best[1])
    _trace("r5c_final", [])


def main():
    stages = sys.argv[1:] or [
        "preflight", "convgb", "ladder", "headline", "trace"
    ]
    best = None
    for st in stages:
        print(f"==== stage {st} ====", flush=True)
        try:
            if st == "preflight":
                stage_preflight()
            elif st == "convgb":
                best = stage_convgb()
            elif st == "ladder":
                stage_ladder()
            elif st == "headline":
                stage_headline(best)
            elif st == "trace":
                stage_trace(best)
            else:
                print(f"unknown stage {st}", flush=True)
        except Exception:
            print(f"stage {st} CRASHED:\n" + traceback.format_exc(),
                  flush=True)
    print("CAMPAIGN-R5C-DONE", flush=True)


if __name__ == "__main__":
    main()

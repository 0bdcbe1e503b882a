"""Round-5 measurement campaign A (one process = one axon chip claim).

Stages, in order (rows appended to runs/bench_suite.jsonl as r5a_*):

  preflight  bench.py --preflight equivalent: compile+parity of every
             Pallas kernel family on the live chip — now including the
             round-5 fused conv-module kernel and the padding-aware
             attention backward plans (runs/preflight_r5.json).
  ab         step-level A/B of the round-5 encoder variants at the
             headline point (batch 64, bf16, policy attention, streaming
             CTC): attn_impl split/packed x conv_impl xla/pallas, plus a
             kernel-forced attention row for the crossover record.
  trace      encoder_trace attribution at the winning combo (and at the
             r4 baseline combo for the delta VERDICT r4 item 9 requires).
  headline   bench row at the measured-best settings (also carries the
             new host_assembly_audio_s_per_s + inline collapse rows).

Usage: python tools/run_campaign_r5.py [stage ...]   (default: all)
"""

from __future__ import annotations

import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.run_campaign2 import bench_once

RUNS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "runs"
)


def stage_preflight():
    from neuralasr_tpu.utils.preflight import run_preflight

    res = run_preflight()
    with open(os.path.join(RUNS, "preflight_r5.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps({"preflight_all_ok": res["all_ok"]}), flush=True)
    return res["all_ok"]


BASE = ["--batch", "64", "--dtype", "bfloat16", "--ctc-impl", "pallas_stream"]


def stage_ab():
    rows = {}
    for name, extra in (
        # r4 baseline combo first (the comparison anchor).
        ("r5a_split_xla", []),
        ("r5a_packed_xla", ["--attn-impl", "packed"]),
        ("r5a_split_convpallas", ["--conv-impl", "pallas"]),
        ("r5a_packed_convpallas",
         ["--attn-impl", "packed", "--conv-impl", "pallas"]),
        # Long-T side sanity: kernel-forced attention on the new plans.
        ("r5a_kernel_forced", ["--attn-min-t", "0"]),
    ):
        rows[name] = bench_once(name, BASE + extra)
    return rows


def stage_ab2():
    """Re-run the two leading combos to bound tunnel variance."""
    for name, extra in (
        ("r5a2_split_xla", []),
        ("r5a2_packed_convpallas",
         ["--attn-impl", "packed", "--conv-impl", "pallas"]),
    ):
        bench_once(name, BASE + extra)


def _trace(tag, extra):
    # encoder_trace runs in THIS process (no new chip claim): call main()
    # with argv.
    import tools.encoder_trace as et

    old = sys.argv
    sys.argv = (
        ["encoder_trace.py", "--batch", "64", "--steps", "5",
         "--trace-dir", os.path.join(RUNS, f"encoder_trace_{tag}")]
        + extra
    )
    try:
        et.main()
    except SystemExit:
        pass
    finally:
        sys.argv = old
    src = os.path.join(RUNS, "encoder_trace_attrib.json")
    dst = os.path.join(RUNS, f"encoder_trace_attrib_{tag}.json")
    if os.path.exists(src):
        os.replace(src, dst)
        with open(dst) as f:
            d = json.load(f)
        print(json.dumps({
            "trace": tag,
            "per_step_ms": d.get("per_step_ms"),
            "top": sorted(
                d.get("groups", {}).items(),
                key=lambda kv: -kv[1]["ms_per_step"],
            )[:6],
        }), flush=True)


def stage_trace():
    _trace("r5_baseline", [])
    _trace("r5_packed_convpallas",
           ["--attn-impl", "packed", "--conv-impl", "pallas"])


def stage_headline():
    bench_once(
        "r5_headline",
        BASE + ["--attn-impl", "packed", "--conv-impl", "pallas"],
    )


STAGES = {
    "preflight": stage_preflight,
    "ab": stage_ab,
    "ab2": stage_ab2,
    "trace": stage_trace,
    "headline": stage_headline,
}


def main():
    wanted = [a for a in sys.argv[1:] if a in STAGES] or list(STAGES)
    log = os.path.join(RUNS, "campaign_r5a.log")
    for st in wanted:
        print(f"==== stage {st} ====", flush=True)
        try:
            STAGES[st]()
        except Exception:
            print(f"==== stage {st} FAILED ====\n"
                  + traceback.format_exc()[-1500:], flush=True)
    print("CAMPAIGN-R5A-DONE", flush=True)


if __name__ == "__main__":
    main()

"""Render the round-4 fresh ladder (+CIs, drift, sweeps) into markdown.

Reads runs/{cfg}_r4.eval*.json, runs/conv_r4_drift.*, runs/ladder_r4_gates
and prints a BASELINE.md-ready block.  Pure host-side; no chip use.
"""

import glob
import json
import os
import sys


def last_json(path):
    try:
        with open(path) as fh:
            lines = [l for l in fh.read().splitlines() if l.strip()]
        return json.loads(lines[-1])
    except Exception:
        return None


def pct(x):
    return "—" if x is None else f"{100 * x:.2f} %"


def ci(rec, key):
    c = rec.get(key) if rec else None
    return "—" if not c else f"[{100 * c[0]:.2f}, {100 * c[1]:.2f}]"


def main():
    for cfg in ("base", "conv", "fusion", "conformer"):
        std = last_json(f"runs/{cfg}_r4.eval.json")
        st = last_json(f"runs/{cfg}_r4.eval_stress.json")
        g = lambda rec, k: rec.get(k) if rec else None
        print(f"| {cfg} | {pct(g(std, 'greedy_wer'))} / "
              f"{pct(g(std, 'beam_wer'))} {ci(std, 'beam_wer_ci95')} | "
              f"{pct(g(st, 'greedy_wer'))} / {pct(g(st, 'beam_wer'))} "
              f"{ci(st, 'beam_wer_ci95')} |")
    for extra in ("fusion_r4.eval_stress_nolm", "conv_r4.eval_stress_seed7",
                  "conformer_r4.eval_stress_seed7", "base_r4.eval_seed7",
                  "conv_r4_drift.eval_stress",
                  "conv_r4_drift.eval_stress_seed7"):
        rec = last_json(f"runs/{extra}.json")
        if rec:
            print(f"{extra}: greedy {pct(rec.get('greedy_wer'))} "
                  f"beam {pct(rec.get('beam_wer'))} "
                  f"ci {ci(rec, 'beam_wer_ci95') if rec.get('beam_wer') else ci(rec, 'greedy_wer_ci95')}")
    g = last_json("runs/ladder_r4_gates.json")
    if g:
        print("gates:", json.dumps(g))
    for cfg in ("conv", "fusion", "conformer"):
        p = f"runs/{cfg}_r4_shift_sweep.jsonl"
        if os.path.exists(p):
            pts = [json.loads(l) for l in open(p) if l.strip()]
            print(cfg, "sweep:",
                  [(r.get("eval_shift_hz"),
                    round(100 * (r.get("beam_wer") or r.get("greedy_wer")), 2))
                   for r in pts])


if __name__ == "__main__":
    main()

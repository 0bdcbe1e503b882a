"""Render the round-5 fresh ladder into a BASELINE.md-ready block and
derive the r5 gates (fresh beam WER + 2x bootstrap-CI half-width, the r4
methodology), including the blank-collapse WER-equality table that the
<30 ms beam decode plan depends on (VERDICT r4 item 5).

Reads runs/{cfg}_ladder.eval*.json as written by tools/run_ladder.py;
writes runs/ladder_r5_gates.json.  Pure host-side; no chip use.
"""

import json
import os


def last_json(path):
    """Last parseable JSON line: gated evals append '[evaluate] WER gate
    passed ...' AFTER the metrics line, so scan from the end."""
    try:
        with open(path) as fh:
            lines = [l for l in fh.read().splitlines() if l.strip()]
    except Exception:
        return None
    for line in reversed(lines):
        try:
            return json.loads(line)
        except Exception:
            continue
    return None


def pct(x):
    return "-" if x is None else f"{100 * x:.2f} %"


def ci(rec, key):
    c = rec.get(key) if rec else None
    return "" if not c else f" [{100 * c[0]:.2f}, {100 * c[1]:.2f}]"


GATE_PROTOCOL = {
    "base": "std", "conv": "stress", "fusion": "stress",
    "conformer": "stress",
}


def main():
    gates = {}
    print("| Config | Standard: greedy / beam [CI95] | "
          "Stress: greedy / beam [CI95] |")
    print("|---|---|---|")
    for cfg in ("base", "conv", "fusion", "conformer"):
        std = last_json(f"runs/{cfg}_ladder.eval.json")
        st = last_json(f"runs/{cfg}_ladder.eval_stress.json")
        g = lambda rec, k: rec.get(k) if rec else None
        print(f"| {cfg} | {pct(g(std, 'greedy_wer'))} / "
              f"{pct(g(std, 'beam_wer'))}{ci(std, 'beam_wer_ci95')} | "
              f"{pct(g(st, 'greedy_wer'))} / "
              f"{pct(g(st, 'beam_wer'))}{ci(st, 'beam_wer_ci95')} |")
        # Gate = gated-protocol fresh beam WER + 2x CI half-width.
        rec = std if GATE_PROTOCOL[cfg] == "std" else st
        if rec and rec.get("beam_wer") is not None:
            wer = rec["beam_wer"]
            c = rec.get("beam_wer_ci95")
            half = (c[1] - c[0]) / 2 if c else 0.02
            gates[cfg] = {
                "protocol": GATE_PROTOCOL[cfg],
                "beam_wer": round(wer, 4),
                "ci95": c,
                "gate": round(wer + 2 * half, 4),
            }

    print("\nBlank-collapse WER equality (0.999 crop vs none; "
          "delta in pp, + = collapse worse):")
    print("| Config | std plain -> collapsed | stress plain -> collapsed |")
    print("|---|---|---|")
    for cfg in ("base", "conv", "fusion", "conformer"):
        row = []
        for proto, suffix in (("std", ""), ("stress", "_stress")):
            plain = last_json(f"runs/{cfg}_ladder.eval{suffix}.json")
            coll = last_json(f"runs/{cfg}_ladder.eval{suffix}_collapse.json")
            pw = plain.get("beam_wer") if plain else None
            cw = coll.get("beam_wer") if coll else None
            if pw is None or cw is None:
                row.append("-")
            else:
                row.append(
                    f"{pct(pw)} -> {pct(cw)} ({100 * (cw - pw):+.2f} pp)"
                )
        print(f"| {cfg} | {row[0]} | {row[1]} |")

    for extra in ("fusion_ladder.eval_stress_nolm",):
        rec = last_json(f"runs/{extra}.json")
        if rec:
            print(f"\n{extra}: greedy {pct(rec.get('greedy_wer'))} "
                  f"beam {pct(rec.get('beam_wer'))}")

    for cfg in ("conv", "fusion", "conformer"):
        p = f"runs/{cfg}_shift_sweep.jsonl"
        if os.path.exists(p):
            pts = [json.loads(l) for l in open(p) if l.strip()]
            print(cfg, "sweep:",
                  [(r.get("eval_shift_hz"),
                    round(100 * (r.get("beam_wer") or r.get("greedy_wer") or 0),
                          2))
                   for r in pts])

    with open("runs/ladder_r5_gates.json", "w") as fh:
        json.dump(gates, fh, indent=1)
    print("\ngates (runs/ladder_r5_gates.json):", json.dumps(gates))


if __name__ == "__main__":
    main()

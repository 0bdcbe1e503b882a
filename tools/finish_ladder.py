"""Finish the WER ladder in a SINGLE process.

The axon tunnel wedges for 10-35 minutes after every client process exits,
so the per-command ladder scripts pay a recovery tax on each step.  This
driver runs the remaining evals and the conformer training through the CLI
mains IN-PROCESS (one chip claim for everything); as a patient client it
simply blocks until the service answers instead of probing.
"""

import contextlib
import io
import sys

from neuralasr_tpu.cli import evaluate as eval_cli
from neuralasr_tpu.cli import train as train_cli


def run(mod, argv, out_json=None):
    print(f"== running: {' '.join(argv)}", flush=True)
    old = sys.argv
    sys.argv = argv
    try:
        if out_json:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                try:
                    mod.main()
                except SystemExit as e:
                    if e.code:
                        raise
            text = buf.getvalue()
            with open(out_json, "w") as fh:
                fh.write(text)
            print(text.strip().splitlines()[-1] if text.strip() else "(empty)",
                  flush=True)
        else:
            try:
                mod.main()
            except SystemExit as e:
                if e.code:
                    raise
    finally:
        sys.argv = old


def main():
    ev = "evaluate.py"
    run(eval_cli, [ev, "--config", "fusion", "--workdir", "runs/fusion_r2",
                   "--max-utts", "512", "--eval-noise", "1.0",
                   "--eval-shift", "50"],
        "runs/fusion_r2.eval_stress.json")
    run(eval_cli, [ev, "--config", "fusion", "--workdir", "runs/fusion_r2",
                   "--max-utts", "512", "--lm-weight", "0"],
        "runs/fusion_r2.eval_nolm.json")
    run(eval_cli, [ev, "--config", "fusion", "--workdir", "runs/fusion_r2",
                   "--max-utts", "512", "--eval-noise", "1.0",
                   "--eval-shift", "50", "--lm-weight", "0"],
        "runs/fusion_r2.eval_stress_nolm.json")

    run(train_cli, ["train.py", "--config", "conformer", "--workdir",
                    "runs/conformer_r2", "--resume"])
    run(eval_cli, [ev, "--config", "conformer", "--workdir",
                   "runs/conformer_r2", "--max-utts", "512"],
        "runs/conformer_r2.eval.json")
    run(eval_cli, [ev, "--config", "conformer", "--workdir",
                   "runs/conformer_r2", "--max-utts", "512",
                   "--eval-noise", "1.0", "--eval-shift", "50"],
        "runs/conformer_r2.eval_stress.json")
    print("FINISH-LADDER-DONE", flush=True)


if __name__ == "__main__":
    main()

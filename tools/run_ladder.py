"""Run the full WER ladder (BASELINE configs 2-5) in ONE process.

Single-process matters on the axon tunnel: the service takes 10-35 minutes
to accept a new client after any TPU process exits, so per-command shell
ladders pay that tax on every step.  This driver trains and evaluates every
config through the CLI mains in-process — one chip claim for the whole
ladder.  Evals cover the standard (preset) and stress (1.0 noise / +50 Hz)
protocols; fusion additionally ablates the LM.

    python tools/run_ladder.py [base conv fusion conformer]
"""

import contextlib
import io
import sys

from neuralasr_tpu.cli import evaluate as eval_cli
from neuralasr_tpu.cli import train as train_cli

STRESS = ["--eval-noise", "1.0", "--eval-shift", "50"]


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
            if text.strip():
                print(text.strip().splitlines()[-1], flush=True)
        else:
            try:
                mod.main()
            except SystemExit as e:
                if e.code:
                    raise
    finally:
        sys.argv = old


def ladder(configs):
    for cfg in configs:
        wd = f"runs/{cfg}_r2"
        run(train_cli,
            ["train.py", "--config", cfg, "--workdir", wd, "--resume"])
        ev = ["evaluate.py", "--config", cfg, "--workdir", wd,
              "--max-utts", "512"]
        run(eval_cli, ev, f"{wd}.eval.json")
        run(eval_cli, ev + STRESS, f"{wd}.eval_stress.json")
        if cfg == "fusion":  # isolate the shallow-fusion gain
            run(eval_cli, ev + ["--lm-weight", "0"], f"{wd}.eval_nolm.json")
            run(eval_cli, ev + STRESS + ["--lm-weight", "0"],
                f"{wd}.eval_stress_nolm.json")
    print("LADDER-DONE", flush=True)


if __name__ == "__main__":
    ladder(sys.argv[1:] or ["base", "conv", "fusion", "conformer"])

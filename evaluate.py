#!/usr/bin/env python
"""Repo-root shim: the evaluation CLI lives at neuralasr_tpu.cli.evaluate
(installed as `neuralasr-evaluate`); this keeps `python evaluate.py ...`
working from a checkout."""

from neuralasr_tpu.cli.evaluate import main

if __name__ == "__main__":
    main()

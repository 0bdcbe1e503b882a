#!/usr/bin/env python
"""Repo-root shim: the training CLI lives at neuralasr_tpu.cli.train
(installed as `neuralasr-train`); this keeps `python train.py ...` working
from a checkout."""

from neuralasr_tpu.cli.train import main

if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Repo-root shim: the transcription CLI lives at
neuralasr_tpu.cli.transcribe (installed as `neuralasr-transcribe`); this
keeps `python transcribe.py ...` working from a checkout."""

from neuralasr_tpu.cli.transcribe import main

if __name__ == "__main__":
    main()

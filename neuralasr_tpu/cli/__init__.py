"""CLI entry points (SURVEY.md §2 L6), installed as console scripts:

  neuralasr-train      -> neuralasr_tpu.cli.train:main
  neuralasr-evaluate   -> neuralasr_tpu.cli.evaluate:main
  neuralasr-transcribe -> neuralasr_tpu.cli.transcribe:main

These live inside the package namespace (not as top-level train/evaluate
modules) so a pip install never collides with other distributions'
top-level modules — e.g. HuggingFace's `evaluate` package.
"""

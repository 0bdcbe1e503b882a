"""Structured JSONL metrics logging (SURVEY.md §6 observability).

The reference prints per-epoch cost/LER lines; here every step's metrics go
to a JSONL file (one object per line: step, loss, grad_norm, audio_s_per_s,
wer, ...) mirrored to stdout at a configurable cadence — everything needed
to fill BASELINE.md comes from these files.
"""

from __future__ import annotations

import json
import sys
import time


class MetricsLogger:
    def __init__(self, path: str | None = None, mirror_every: int = 1):
        self.path = path
        self.mirror_every = mirror_every
        self._fh = open(path, "a") if path else None
        self._count = 0
        self.t0 = time.time()

    def log(self, **metrics) -> None:
        metrics.setdefault("wall_s", round(time.time() - self.t0, 3))
        line = json.dumps(metrics, default=float)
        if self._fh:
            self._fh.write(line + "\n")
            self._fh.flush()
        self._count += 1
        if self._count % self.mirror_every == 0:
            print(line, file=sys.stdout, flush=True)

    def close(self) -> None:
        if self._fh:
            self._fh.close()

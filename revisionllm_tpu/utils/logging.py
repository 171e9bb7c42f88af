"""Structured metric logging + timing.

The reference's observability is tqdm + HF Trainer tensorboard scalars
(SURVEY.md §5.1/§5.5); here every training/eval process writes an append-only
JSONL metric stream (greppable, mergeable across shards like the prediction
logs) and `StageTimer` wraps jax.profiler regions for on-demand traces.
"""

from __future__ import annotations

import json
import os
import sys
import time
from contextlib import contextmanager
from typing import Optional


class MetricLogger:
    def __init__(self, path: Optional[str] = None, stream=sys.stderr):
        self.path = path
        self.stream = stream
        if path is not None:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def log(self, **metrics) -> None:
        metrics.setdefault("time", time.time())
        line = json.dumps(metrics)
        if self.path is not None:
            with open(self.path, "a") as f:
                f.write(line + "\n")
        if self.stream is not None:
            print(line, file=self.stream)


class StageTimer:
    """Named wall-clock stages + optional jax.profiler trace annotations."""

    def __init__(self, logger: Optional[MetricLogger] = None):
        self.logger = logger
        self.totals = {}

    @contextmanager
    def stage(self, name: str):
        import jax

        t0 = time.perf_counter()
        with jax.profiler.TraceAnnotation(name):
            yield
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        if self.logger is not None:
            self.logger.log(stage=name, seconds=dt)


@contextmanager
def profiler_trace(log_dir: str):
    """Capture a jax.profiler trace (view with tensorboard/xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

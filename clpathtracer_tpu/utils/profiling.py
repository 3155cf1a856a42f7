"""Tracing / profiling / metrics.

The reference instruments with printf wall-timers (src/model.c:136-143) and
an unused in-kernel step counter (src/kernel.cl:319-331). Here: structured
stage timers, jax.profiler trace integration, and JSON-line metric
emission (the bench contract's format).
"""

from __future__ import annotations

import contextlib
import json
import sys
import time
from typing import Optional

import jax


class StageTimer:
    """Named wall-clock stages, reportable as a dict or JSON line.

    >>> t = StageTimer()
    >>> with t.stage("build"): ...
    >>> t.report()  # {"build": 1.23}
    """

    def __init__(self):
        self.times = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.times[name] = self.times.get(name, 0.0) + time.time() - t0

    def report(self) -> dict:
        return dict(self.times)

    def emit(self, file=sys.stderr, **extra):
        print(json.dumps({**self.times, **extra}), file=file, flush=True)


@contextlib.contextmanager
def trace(path: Optional[str] = None):
    """jax.profiler trace context: captures device + host timelines viewable
    in TensorBoard / Perfetto. No-op when path is None."""
    if path is None:
        yield
        return
    jax.profiler.start_trace(path)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def emit_metric(metric: str, value: float, unit: str,
                vs_baseline: Optional[float] = None, file=None,
                **extra) -> dict:
    """One JSON metric line (the bench.py contract). `file` defaults to
    sys.stdout at CALL time (a default-arg binding would pin the stream
    captured at import)."""
    rec = {"metric": metric, "value": value, "unit": unit}
    if vs_baseline is not None:
        rec["vs_baseline"] = vs_baseline
    rec.update(extra)
    print(json.dumps(rec), file=file if file is not None else sys.stdout,
          flush=True)
    return rec

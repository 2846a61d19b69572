"""Observability: structured step logging and per-bucket timing.

The reference logs via print + a progress bar only (SURVEY §5.5); here every
train step can be recorded as a JSONL event and per-bucket step-time
statistics are first-class (SURVEY §5.1's guidance for the TPU build).
``jax.profiler`` trace capture is wired through :meth:`StepTimer.trace`.
"""

import collections
import contextlib
import json
import os
import time
from typing import Dict, Optional


class MetricLogger:
    """Prints human-readable lines and optionally appends JSONL events."""

    def __init__(self, jsonl_path: Optional[str] = None):
        self.jsonl_path = jsonl_path
        if jsonl_path:
            os.makedirs(os.path.dirname(os.path.abspath(jsonl_path)),
                        exist_ok=True)

    def log(self, event: str, **fields):
        msg = " ".join(f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}"
                       for k, v in fields.items())
        print(f"[{event}] {msg}", flush=True)
        if self.jsonl_path:
            with open(self.jsonl_path, "a") as f:
                f.write(json.dumps({"event": event, "ts": time.time(),
                                    **fields}) + "\n")


class StepTimer:
    """Per-bucket wall-clock accounting for multigrid training."""

    def __init__(self):
        self.totals: Dict = collections.defaultdict(float)
        self.counts: Dict = collections.defaultdict(int)
        self._t0 = None
        self._key = None

    def start(self, key):
        self._key = key
        self._t0 = time.perf_counter()

    def stop(self):
        if self._t0 is None:
            return 0.0
        dt = time.perf_counter() - self._t0
        self.totals[self._key] += dt
        self.counts[self._key] += 1
        self._t0 = None
        return dt

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            str(k): {"mean_s": self.totals[k] / max(self.counts[k], 1),
                     "steps": self.counts[k]}
            for k in self.totals
        }

    @contextlib.contextmanager
    def trace(self, logdir: str):
        """Capture a jax.profiler trace around a block."""
        import jax
        jax.profiler.start_trace(logdir)
        try:
            yield
        finally:
            jax.profiler.stop_trace()

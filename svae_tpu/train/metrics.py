"""Structured per-step metrics (greenfield -- SURVEY.md section 5: the
reference only prints ELBO from a callback).

``MetricsWriter`` appends JSONL records; ``StepTimer`` measures fenced
device step time (``block_until_ready`` before reading the clock, so the
number is the real step latency, not dispatch time).
"""

import json
import time

import jax


class MetricsWriter:
    def __init__(self, path=None):
        self.path = path
        self._f = open(path, "a") if path else None

    def write(self, step, **values):
        rec = {"step": int(step), "time": time.time(), **values}
        if self._f is not None:
            self._f.write(json.dumps(rec) + "\n")
            self._f.flush()
        return rec

    def close(self):
        if self._f is not None:
            self._f.close()
            self._f = None


class StepTimer:
    """Fenced wall-clock timing of device computations."""

    def __init__(self):
        self.last = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, *arrays):
        for a in arrays:
            jax.block_until_ready(a)
        self.last = time.perf_counter() - self._t0
        return self.last

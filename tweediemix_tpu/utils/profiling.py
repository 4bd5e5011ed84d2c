"""Tracing / profiling hooks.

The reference has no profiling beyond tqdm bars (SURVEY §5.1). Here:

* ``trace(dir)``: context manager around ``jax.profiler`` traces (viewable
  in TensorBoard/XProf) — wraps whole sampling runs;
* ``annotate(name)``: ``TraceAnnotation`` for phase-level markers inside a
  run (prologue / joint / jumping / fused / decode);
* ``PhaseTimer``: lightweight wall-clock phase timing with a JSON-able
  report, used by the CLIs under ``--profile``.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, List, Tuple

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class PhaseTimer:
    def __init__(self):
        self.phases: List[Tuple[str, float]] = []

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        with annotate(name):
            yield
        self.phases.append((name, time.perf_counter() - t0))

    def report(self) -> Dict[str, float]:
        out: Dict[str, float] = {}
        for name, dt in self.phases:
            out[name] = out.get(name, 0.0) + dt
        return out

    def dump(self, path: str):
        with open(path, "w") as f:
            json.dump(self.report(), f, indent=2)

"""Profiling/tracing hooks (the reference disables torch profilers at every
driver startup, Spatial_cnn/run.py:301-303; SURVEY.md §5 names the JAX
profiler + block_until_ready timing as the TPU-native replacement).

Usage:
  with trace("/tmp/jax-trace"):          # XProf/TensorBoard trace
      train_step(state, batch)

  with timed("train_step") as t:         # wall-clock with device sync
      out = train_step(state, batch)
  print(t.seconds)
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class _Timer:
    name: str
    seconds: float = 0.0
    result: Optional[object] = None


@contextlib.contextmanager
def timed(name: str = ""):
    """Wall-clock timer; set ``t.result`` to a device value inside the block
    to include its completion (block_until_ready) in the measurement."""
    t = _Timer(name)
    t.result = None
    start = time.perf_counter()
    try:
        yield t
    finally:
        if t.result is not None:
            jax.block_until_ready(t.result)
        t.seconds = time.perf_counter() - start


@dataclass
class StepTimer:
    """Accumulates per-phase wall times across steps (eta logging parity,
    Spatial_cnn/run.py:455-459)."""

    totals: Dict[str, float] = field(default_factory=dict)
    counts: Dict[str, int] = field(default_factory=dict)

    @contextlib.contextmanager
    def phase(self, name: str, result=None):
        start = time.perf_counter()
        try:
            yield
        finally:
            if result is not None:
                jax.block_until_ready(result)
            dt = time.perf_counter() - start
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, float]:
        return {k: self.totals[k] / max(self.counts[k], 1)
                for k in self.totals}

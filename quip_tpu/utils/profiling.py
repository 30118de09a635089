"""Tracing / profiling / determinism utilities (SURVEY.md §5.1-5.2).

The reference's observability is ad-hoc wall-clock prints (gptq.py:30,
opt.py:188) and manual TF32 disabling (gptq.py:13-14). Here:

  * PhaseTimer — structured per-phase wall-clock accounting with a summary
    table (the layer-streaming driver's per-layer times feed this).
  * trace(path) — context manager around jax.profiler for real device
    traces (degrades to a no-op where the backend lacks profiler support).
  * seed_everything — one switch for python/numpy/jax determinism
    (reference: datautils.py:5-7, zeroShot/evaluator.py:29-32).
"""
from __future__ import annotations

import contextlib
import random
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import numpy as np
import jax


class PhaseTimer:
    """Accumulate wall-clock per named phase; print a summary."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.time()
        try:
            yield
        finally:
            self.totals[name] += time.time() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        rows = [f"{'phase':24s} {'total_s':>9s} {'calls':>6s} {'avg_ms':>8s}"]
        for name, tot in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            rows.append(f"{name:24s} {tot:9.2f} {n:6d} "
                        f"{tot / n * 1e3:8.1f}")
        return "\n".join(rows)


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace if supported; silent no-op otherwise."""
    if not log_dir:
        yield
        return
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


def seed_everything(seed: int) -> jax.Array:
    """Seed python/numpy RNGs and return a jax PRNG key."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.key(seed)

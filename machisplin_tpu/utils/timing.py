"""Structured per-phase timing + JAX profiler hooks.

The reference's only instrumentation is scattered Sys.time() prints
(V73:219/245/441/685, gbm.step elapsed-minutes V73:2155).  This module is the
framework-grade replacement: a phase timer that builds a structured report,
and an optional jax.profiler trace context for TPU-level profiling.
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

__all__ = ["PhaseTimer", "trace"]


@dataclass
class PhaseTimer:
    phases: dict = field(default_factory=dict)
    _order: list = field(default_factory=list)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            if name not in self.phases:
                self._order.append(name)
                self.phases[name] = 0.0
            self.phases[name] += dt

    def report(self) -> str:
        total = sum(self.phases.values())
        lines = [f"{'phase':<40} {'seconds':>10} {'share':>7}"]
        for name in self._order:
            dt = self.phases[name]
            lines.append(f"{name:<40} {dt:>10.2f} {dt / max(total, 1e-9):>6.1%}")
        lines.append(f"{'TOTAL':<40} {total:>10.2f}")
        return "\n".join(lines)

    def as_dict(self) -> dict:
        return dict(self.phases)


@contextlib.contextmanager
def trace(log_dir: str | None):
    """jax.profiler trace when a log_dir is given; no-op otherwise."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

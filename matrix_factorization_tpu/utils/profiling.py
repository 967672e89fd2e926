"""Tracing / profiling / throughput observability.

The reference's only performance observation is notebook ``%%time`` cells
and progress prints (SURVEY.md §5.1).  Here:

* :class:`Timer` — wall-clock block timer that forces device completion
  through a host fetch (``block_until_ready`` is unreliable on tunneled
  backends — a scalar reduction fetch is authoritative).
* :class:`ThroughputMeter` — rating-updates/sec/chip counter, the
  BASELINE.json headline metric.
* :func:`trace` — ``jax.profiler`` trace context writing TensorBoard
  protos to a directory (no-op fallback when the profiler is unavailable).
* :class:`EpochLogger` — per-epoch RMSE/throughput logging like the
  reference's verbose prints (``kernel_matrix_factorization.py:442-443``).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import List, Optional

import jax
import jax.numpy as jnp


def force_completion(*arrays) -> float:
    """Force device completion via a scalar host fetch; returns the sum."""
    total = 0.0
    for a in arrays:
        total += float(jnp.sum(a))
    return total


class Timer:
    """``with Timer() as t: ...`` then ``t.seconds``."""

    def __init__(self, sync_arrays=()):
        self._sync = tuple(sync_arrays)
        self.seconds = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        for a in self._sync:
            force_completion(a)
        self.seconds = time.perf_counter() - self._t0
        return False


@dataclass
class ThroughputMeter:
    """Accumulates (updates, seconds) and reports updates/sec/chip."""

    n_chips: int = 1
    total_updates: int = 0
    total_seconds: float = 0.0

    def record(self, n_updates: int, seconds: float) -> None:
        self.total_updates += int(n_updates)
        self.total_seconds += float(seconds)

    @property
    def updates_per_sec(self) -> float:
        return self.total_updates / self.total_seconds if self.total_seconds else 0.0

    @property
    def updates_per_sec_per_chip(self) -> float:
        return self.updates_per_sec / max(1, self.n_chips)

    def report(self) -> dict:
        return {
            "updates_per_sec": self.updates_per_sec,
            "updates_per_sec_per_chip": self.updates_per_sec_per_chip,
            "total_updates": self.total_updates,
            "total_seconds": self.total_seconds,
            "n_chips": self.n_chips,
        }


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace context; silently no-ops if unsupported."""
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


@dataclass
class EpochLogger:
    verbose: int = 1
    history: List[dict] = field(default_factory=list)

    def log(self, epoch: int, rmse: float, n_updates: int = 0,
            seconds: float = 0.0) -> None:
        row = {"epoch": epoch, "rmse": rmse}
        if seconds > 0:
            row["updates_per_sec"] = n_updates / seconds
        self.history.append(row)
        if self.verbose:
            extra = (
                f"  ({row['updates_per_sec'] / 1e6:.1f}M updates/s)"
                if "updates_per_sec" in row else ""
            )
            print(f"Epoch {epoch} train RMSE: {rmse:.4f}{extra}")

"""Tracing, profiling, and throughput observability.

The reference ships nothing here (SURVEY §5: no timers or profiler hooks
anywhere). This module provides:

- ``trace(name)``: a context manager wrapping ``jax.profiler.TraceAnnotation``
  plus wall-clock accounting, safe on any backend.
- ``start_trace``/``stop_trace``: TensorBoard trace capture around a region.
- ``StageTimer``: per-stage latency/throughput counters used by the
  benchmark harness and available to applications (frames/s, faces/s).
- ``get_logger``: the framework's structured logger (the reference used
  bare ``click.echo`` everywhere).
"""

import contextlib
import logging
import time
from collections import defaultdict


def get_logger(name="terran_tpu"):
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter(
            "%(asctime)s %(name)s %(levelname)s %(message)s"
        ))
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
    return logger


@contextlib.contextmanager
def trace(name):
    """Annotate a region for the JAX profiler and record wall time."""
    import jax

    start = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    _GLOBAL_TIMER.record(name, time.perf_counter() - start)


def start_trace(log_dir):
    import jax

    jax.profiler.start_trace(str(log_dir))


def stop_trace():
    import jax

    jax.profiler.stop_trace()


class StageTimer:
    """Accumulates per-stage wall time and item counts."""

    def __init__(self):
        self.times = defaultdict(float)
        self.counts = defaultdict(int)
        self.items = defaultdict(int)

    def record(self, name, seconds, items=0):
        self.times[name] += seconds
        self.counts[name] += 1
        self.items[name] += items

    @contextlib.contextmanager
    def stage(self, name, items=0):
        start = time.perf_counter()
        yield
        self.record(name, time.perf_counter() - start, items)

    def summary(self):
        """Per-stage dict of total seconds, calls, mean latency, items/sec."""
        out = {}
        for name, total in self.times.items():
            calls = self.counts[name]
            items = self.items[name]
            out[name] = {
                "total_s": round(total, 4),
                "calls": calls,
                "mean_ms": round(1000 * total / max(calls, 1), 3),
                "items_per_s": (
                    round(items / total, 2) if total > 0 and items else None
                ),
            }
        return out

    def reset(self):
        self.times.clear()
        self.counts.clear()
        self.items.clear()


_GLOBAL_TIMER = StageTimer()


def global_timer():
    return _GLOBAL_TIMER

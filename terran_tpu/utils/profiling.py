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


class Timeline:
    """Per-batch event timeline for pipeline serialization analysis.

    Records (batch id, event, start, end, bytes) spans against one shared
    origin so overlap (or its absence) between uploads, dispatches, and
    fetches across batches is directly visible. Wall spans measure where
    the HOST waited — exactly the serialization question (device-side
    cost is benchmarks/device_time.py's job). Used by ``bench.py``'s
    BENCH_TIMELINE sweep (r3 verdict: ~1.7 s/batch was unaccounted; the
    timeline is the instrument that locates it).
    """

    def __init__(self):
        self.events = []
        self.origin = time.perf_counter()

    @contextlib.contextmanager
    def span(self, batch, event, nbytes=0):
        start = time.perf_counter()
        yield
        self.events.append(
            (batch, event, start - self.origin,
             time.perf_counter() - self.origin, int(nbytes))
        )

    def mark(self, batch, event, nbytes=0):
        t = time.perf_counter() - self.origin
        self.events.append((batch, event, t, t, int(nbytes)))

    def rows(self):
        """Compact [batch, event, start_ms, dur_ms, bytes] rows."""
        return [
            [b, e, round(s * 1000, 1), round((t - s) * 1000, 1), n]
            for b, e, s, t, n in sorted(self.events, key=lambda r: r[2])
        ]

    def gaps(self):
        """Host-idle gaps > 1 ms between consecutive spans per batch —
        time the main thread spent elsewhere (another batch's stages, or
        genuinely idle)."""
        out = []
        by_batch = defaultdict(list)
        for b, e, s, t, _ in self.events:
            by_batch[b].append((s, t, e))
        for b, spans in by_batch.items():
            spans.sort()
            for (s0, t0, e0), (s1, t1, e1) in zip(spans, spans[1:]):
                if s1 - t0 > 0.001:
                    out.append(
                        [b, f"{e0}->{e1}", round(t0 * 1000, 1),
                         round((s1 - t0) * 1000, 1)]
                    )
        return out


_GLOBAL_TIMER = StageTimer()


def global_timer():
    return _GLOBAL_TIMER

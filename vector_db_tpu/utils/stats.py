"""Observability: timing counters, search/mutation metrics, profiler hooks.

The reference's observability is wall-clock timing in tests plus per-index
stats dumps (SURVEY.md §5.1 — HnswIndex.getIndexStats level histogram,
HNSWPQIndex::getMemoryUsage) and SLF4J logging (§5.5).  Here:

  * `Counters` — cheap process-wide counters/timers any component can bump.
  * `timed(name)` — context manager recording wall time per section.
  * `trace(path)` — wraps jax.profiler for device-level traces.
  * module logger — stdlib logging, configured once, used across the package.
"""

from __future__ import annotations

import collections
import contextlib
import logging
import threading
import time
from typing import Iterator

logger = logging.getLogger("vector_db_tpu")
if not logger.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(
        logging.Formatter("%(asctime)s %(levelname)s %(name)s: %(message)s")
    )
    logger.addHandler(_h)
    logger.setLevel(logging.WARNING)


class Counters:
    """Thread-safe counters + accumulated timers (single-writer friendly)."""

    def __init__(self):
        self._lock = threading.Lock()
        self.counts: dict[str, int] = collections.defaultdict(int)
        self.times: dict[str, float] = collections.defaultdict(float)

    def bump(self, name: str, n: int = 1) -> None:
        with self._lock:
            self.counts[name] += n

    def add_time(self, name: str, seconds: float) -> None:
        with self._lock:
            self.times[name] += seconds
            self.counts[f"{name}.calls"] += 1

    def snapshot(self) -> dict:
        with self._lock:
            out: dict = {"counts": dict(self.counts), "seconds": dict(self.times)}
        # derive mean latencies
        means = {}
        for name, total in out["seconds"].items():
            calls = out["counts"].get(f"{name}.calls", 0)
            if calls:
                means[name] = total / calls
        out["mean_seconds"] = means
        return out

    def reset(self) -> None:
        with self._lock:
            self.counts.clear()
            self.times.clear()


#: process-wide default instance
GLOBAL = Counters()


@contextlib.contextmanager
def timed(name: str, counters: Counters = GLOBAL) -> Iterator[None]:
    """Record wall time of a section (the analog of the reference's
    System.currentTimeMillis bracketing, HnswIndex.java:432-466)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        counters.add_time(name, time.perf_counter() - t0)


@contextlib.contextmanager
def trace(path: str = "/tmp/vdb_trace") -> Iterator[None]:
    """Device-level profiling via jax.profiler (view with TensorBoard or
    xprof).  Wrap a hot section::

        with stats.trace("/tmp/trace"):
            db.search_batch(queries, 10)
    """
    import jax

    jax.profiler.start_trace(path)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Decorator: time a function into GLOBAL under ``name``."""

    def deco(fn):
        def wrapper(*args, **kwargs):
            with timed(name):
                return fn(*args, **kwargs)

        wrapper.__name__ = getattr(fn, "__name__", name)
        wrapper.__doc__ = fn.__doc__
        return wrapper

    return deco

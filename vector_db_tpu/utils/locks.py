"""A minimal reader-writer lock for the VectorDatabase facade.

The engine's state model is immutable pytrees with a single-writer host
(SURVEY.md §2.3: shared_mutex -> functional state) — but two things still
need exclusion when USERS call the facade from multiple threads, exactly
the cases the reference guards with std::shared_mutex
(reference: index/HnswIndex.java synchronized blocks,
native/index/HNSWIndex.h rw-locks):

  * writer vs writer: big-store writes DONATE the previous state buffers
    (core/store._write_slots_int8 — an undonated scatter would transiently
    double a multi-GB packed array), so two concurrent writers would hand
    the same donated buffer to two device calls;
  * writer vs reader: a search dispatched against state buffers that a
    concurrent write then donates would execute on deleted buffers.

Readers are concurrent with each other (searches never mutate); a writer
waits for active readers and blocks new ones — the shared_mutex shape.
Single-threaded use pays one uncontended lock per call (~1 µs against
multi-ms device searches).
"""

from __future__ import annotations

import threading
from contextlib import contextmanager


class RWLock:
    """Writer-preferring reader-writer lock (no stdlib equivalent)."""

    def __init__(self) -> None:
        self._cond = threading.Condition()
        self._readers = 0
        self._writer = False
        self._writers_waiting = 0

    @contextmanager
    def read(self):
        with self._cond:
            # writer preference: don't starve mutations under heavy search
            while self._writer or self._writers_waiting:
                self._cond.wait()
            self._readers += 1
        try:
            yield
        finally:
            with self._cond:
                self._readers -= 1
                if self._readers == 0:
                    self._cond.notify_all()

    @contextmanager
    def write(self):
        with self._cond:
            self._writers_waiting += 1
            while self._writer or self._readers:
                self._cond.wait()
            self._writers_waiting -= 1
            self._writer = True
        try:
            yield
        finally:
            with self._cond:
                self._writer = False
                self._cond.notify_all()

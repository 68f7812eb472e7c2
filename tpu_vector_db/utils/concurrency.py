"""Readers-writer lock for the store's query/mutate split.

The store's device buffers are immutable jax arrays EXCEPT at append
time, when _write_rows donates the old buffer (donate_argnums) — a
query dispatched against a donated buffer raises. Queries therefore
cannot run lock-free against mutations, but they CAN run concurrently
with each other: a batch_query only reads host bookkeeping and
dispatches pure device programs. Serializing queries behind one mutex
was the REST layer's real bottleneck — each coalesced flush held the
store lock through a full blocking device call (~45 ms through the axon
tunnel), so concurrent flushes never overlapped in the TPU stream
(measured: 64-client load test flat at ~444 QPS with the device ceiling
at 1399; benchmarks/load_test.py).

Writer-preference: once a writer waits, new readers queue behind it, so
a sustained query stream cannot starve ingest.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager


class RWLock:
    """threading-based readers-writer lock, writer-preference.

    Not reentrant in either direction: a thread holding write must not
    acquire read (the store's mutators never query through batch_query —
    the ANN self-check uses _flat_topk directly).
    """

    def __init__(self) -> None:
        self._cond = threading.Condition()
        self._readers = 0
        self._writer = False
        self._writers_waiting = 0

    def acquire_read(self) -> None:
        with self._cond:
            while self._writer or self._writers_waiting:
                self._cond.wait()
            self._readers += 1

    def release_read(self) -> None:
        with self._cond:
            self._readers -= 1
            if self._readers == 0:
                self._cond.notify_all()

    def acquire_write(self) -> None:
        with self._cond:
            self._writers_waiting += 1
            try:
                while self._writer or self._readers:
                    self._cond.wait()
            finally:
                self._writers_waiting -= 1
            self._writer = True

    def release_write(self) -> None:
        with self._cond:
            self._writer = False
            self._cond.notify_all()

    @contextmanager
    def read(self):
        self.acquire_read()
        try:
            yield
        finally:
            self.release_read()

    @contextmanager
    def write(self):
        self.acquire_write()
        try:
            yield
        finally:
            self.release_write()

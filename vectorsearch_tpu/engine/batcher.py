"""Cross-request query micro-batching.

The reference serves concurrent searches with goroutines, each doing its
own SQL batch scan (server/search.go:45,241-273) — concurrency comes from
the database. On TPU one device runs one program at a time, so concurrency
must come from batching: a 512-query dispatch costs barely more than a
1-query dispatch (the corpus read dominates), and through the remote
tunnel every dispatch pays ~10-40 ms of round-trip latency.

Mechanism — backpressure coalescing (continuous batching):

  * The first caller for a dispatch key becomes the batch LEADER and
    blocks on the global dispatch semaphore (one device program at a
    time, matching the hardware).
  * While the leader waits for the device, followers with the same key
    append their query rows to the open batch.
  * When the leader acquires the device it atomically closes the batch,
    pads it to a power-of-two row class (jit shape reuse), runs ONE
    device dispatch, and publishes per-row slices.

At low load the semaphore is free, the leader dispatches immediately, and
no latency is added. Under load, batches fill exactly while the device is
busy — throughput converges to the kernel's batched QPS.

The dispatch key must pin the index snapshot (searches are lock-free
snapshot reads; rows batched together must read the same snapshot), so
callers pass the snapshot object itself — the batch holds a strong
reference, which also keeps id()-keyed maps collision-free.
"""
from __future__ import annotations

import threading

import numpy as np

from .. import constants
from ..utils.errors import fresh_exc


# Batch size classes: each class is one compiled program per (snapshot
# shape, k, nprobe); through the remote-compile tunnel every new shape
# costs 30-120 s, so classes are sparse — these three plus the
# constants.MAX_QUERY_BATCH cap (=256 by default) — and Engine.warmup
# precompiles ALL of them (a cold class means a mid-traffic compile).
BATCH_CLASSES = (1, 8, 64)


def _pad_class(m: int, cap: int) -> int:
    for c in BATCH_CLASSES:
        if m <= c:
            return min(c, cap)
    return cap


class _Batch:
    __slots__ = ("rows", "done", "closed", "result", "error", "snapshot")

    def __init__(self, snapshot):
        self.rows: list[np.ndarray] = []
        self.done = threading.Event()
        self.closed = False
        self.result = None
        self.error: BaseException | None = None
        self.snapshot = snapshot  # strong ref: pins id() while open


class QueryBatcher:
    """Coalesce concurrent single-query searches into device batches."""

    def __init__(self, max_batch: int | None = None):
        self.max_batch = max_batch or constants.MAX_QUERY_BATCH
        self._lock = threading.Lock()
        self._device = threading.Semaphore(1)
        self._open: dict[tuple, _Batch] = {}
        # observability: dispatches vs rows served (tests + /api/stats)
        self.dispatches = 0
        self.rows_served = 0

    def submit(self, key: tuple, snapshot, row: np.ndarray, run_fn):
        """Score one query row, possibly batched with concurrent callers.

        key: hashable dispatch signature — must include id(snapshot) plus
          every static shape parameter of run_fn (k, nprobe, ...).
        snapshot: the index object the key's id() refers to.
        row: f32[D] query vector.
        run_fn(queries f32[M, D]) -> (scores[M, k], ids[M, k]).
        Returns (scores[k], ids[k]) numpy rows for this query.
        """
        with self._lock:
            batch = self._open.get(key)
            if batch is not None and not batch.closed:
                idx = len(batch.rows)
                batch.rows.append(row)
                if len(batch.rows) >= self.max_batch:
                    batch.closed = True
                    self._open.pop(key, None)
                leader = False
            else:
                batch = _Batch(snapshot)
                batch.rows.append(row)
                idx = 0
                self._open[key] = batch
                leader = True

        if leader:
            self._device.acquire()
            try:
                with self._lock:
                    batch.closed = True
                    if self._open.get(key) is batch:
                        self._open.pop(key)
                    rows = batch.rows
                m = len(rows)
                m_pad = _pad_class(m, self.max_batch)
                q = np.stack(rows)
                if m_pad > m:
                    q = np.concatenate(
                        [q, np.broadcast_to(q[:1], (m_pad - m,) + q.shape[1:])]
                    )
                try:
                    scores, ids = run_fn(q)
                    batch.result = (np.asarray(scores), np.asarray(ids))
                except BaseException as e:  # propagate to every waiter
                    batch.error = e
                with self._lock:
                    self.dispatches += 1
                    self.rows_served += m
            finally:
                self._device.release()
                batch.done.set()
        else:
            batch.done.wait()

        if batch.error is not None:
            # per-waiter copy: many coalesced threads re-raising one
            # instance would interleave __traceback__ mutation
            raise fresh_exc(batch.error)
        scores, ids = batch.result
        return scores[idx], ids[idx]

    def submit_many(self, rows: list[np.ndarray], run_fn):
        """Score an explicit batch of query rows (the batched /api/search
        path). Unlike submit(), the caller already HAS a batch, so there
        is nothing to coalesce: chunk at the max batch class and dispatch
        each chunk under the device semaphore (serialized with concurrent
        single-query batches — one device program at a time).

        run_fn(queries f32[M, D]) -> (scores[M, k], ids[M, k]).
        Returns (scores[N, k], ids[N, k]) for the N input rows.
        """
        out_scores, out_ids = [], []
        for start in range(0, len(rows), self.max_batch):
            chunk = rows[start : start + self.max_batch]
            m = len(chunk)
            m_pad = _pad_class(m, self.max_batch)
            q = np.stack(chunk)
            if m_pad > m:
                q = np.concatenate(
                    [q, np.broadcast_to(q[:1], (m_pad - m,) + q.shape[1:])]
                )
            self._device.acquire()
            try:
                scores, ids = run_fn(q)
            finally:
                self._device.release()
            with self._lock:
                self.dispatches += 1
                self.rows_served += m
            out_scores.append(np.asarray(scores)[:m])
            out_ids.append(np.asarray(ids)[:m])
        return np.concatenate(out_scores), np.concatenate(out_ids)

    def stats(self) -> dict:
        with self._lock:
            return {
                "dispatches": self.dispatches,
                "rows_served": self.rows_served,
            }

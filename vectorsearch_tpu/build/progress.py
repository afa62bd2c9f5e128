"""Build progress surface (reference: dnc/dnc.go:81-90 mpb bars + EWMA ETA).

The reference renders per-phase terminal progress bars during index
builds. Our build's hot loop is a fused device-side while_loop
(build/kmeans.py) that deliberately never syncs mid-phase — per-iteration
callbacks would add device->host round trips to a path tuned to have
none (CLAUDE.md: first-D2H stall, tunnel latency). So progress here is
HOST-side and phase-grained:

  * every build phase (upload, superset, lloyd, drop-small, balance)
    reports start/stop through the `phase()` context manager;
  * per-phase durations feed an EWMA keyed by (phase, ~corpus rows) so
    the NEXT build of similar scale gets an ETA;
  * a daemon watcher logs a heartbeat while any phase runs longer than
    LOG_EVERY_S — a 500 s 10M rebuild is no longer silent mid-phase;
  * Engine.stats() exposes the live snapshot under "build" so
    /api/stats shows phase, elapsed, and ETA while a rebuild runs.

One build runs at a time per process (store build_locks serialize
cross-process; Engine.refresh_category's per-category lock serializes
in-process), so a module-level tracker is sufficient — concurrent
category builds would interleave heartbeats but never corrupt state
(everything is under one lock).
"""
from __future__ import annotations

import math
import threading
import time

LOG_EVERY_S = 15.0
_EWMA_ALPHA = 0.5


def _scale_bucket(n_rows: int) -> int:
    """Bucket corpus size by order of magnitude so a 1M build's phase
    times don't predict a 10M build's."""
    return 0 if n_rows <= 0 else int(math.log10(max(10, n_rows)))


class BuildProgress:
    def __init__(self):
        self._lock = threading.Lock()
        # EWMA of phase duration, keyed (phase_name, scale_bucket)
        self._ewma: dict[tuple[str, int], float] = {}
        self._reset_locked()
        self._watcher: threading.Thread | None = None

    def _reset_locked(self):
        self.active = False
        self.category: int | None = None
        self.n_rows = 0
        self.build_t0 = 0.0
        self.phase_name: str | None = None
        self.phase_t0 = 0.0
        self.phase_detail = ""
        self.phases_done: list[dict] = []

    # ------------------------------------------------------------ build

    def begin(self, n_rows: int, category: int | None = None) -> None:
        with self._lock:
            self._reset_locked()
            self.active = True
            self.category = category
            self.n_rows = int(n_rows)
            self.build_t0 = time.monotonic()
        self._ensure_watcher()

    def end(self) -> None:
        with self._lock:
            self._reset_locked()

    # ------------------------------------------------------------ phase

    def phase(self, name: str, detail: str = ""):
        return _Phase(self, name, detail)

    def _phase_start(self, name: str, detail: str) -> bool:
        """Returns False (no-op) when a phase is already open: the
        balance pass runs nested kmeans() sub-splits whose inner
        superset/lloyd phases would otherwise clobber the outer phase
        and pollute the EWMA with sub-sample durations."""
        with self._lock:
            if self.phase_name is not None:
                return False
            if not self.active:
                # direct build_centroids/kmeans callers (bench, tools)
                # that never called begin() still get heartbeats + ETA
                self.active = True
                self.build_t0 = time.monotonic()
            self.phase_name = name
            self.phase_detail = detail
            self.phase_t0 = time.monotonic()
        self._ensure_watcher()
        return True

    def _phase_end(self, name: str) -> None:
        with self._lock:
            if self.phase_name != name:
                return
            dur = time.monotonic() - self.phase_t0
            key = (name, _scale_bucket(self.n_rows))
            prev = self._ewma.get(key)
            self._ewma[key] = (
                dur if prev is None
                else _EWMA_ALPHA * dur + (1 - _EWMA_ALPHA) * prev
            )
            self.phases_done.append(
                {"phase": name, "seconds": round(dur, 1)}
            )
            self.phase_name = None
            self.phase_detail = ""

    # --------------------------------------------------------- snapshot

    def snapshot(self) -> dict | None:
        """Live view for /api/stats; None when no build is running."""
        with self._lock:
            if not self.active:
                return None
            now = time.monotonic()
            out = {
                "category": self.category,
                "rows": self.n_rows,
                "elapsed_s": round(now - self.build_t0, 1),
                "phases_done": list(self.phases_done),
            }
            if self.phase_name is not None:
                key = (self.phase_name, _scale_bucket(self.n_rows))
                expect = self._ewma.get(key)
                phase_elapsed = now - self.phase_t0
                out["phase"] = self.phase_name
                if self.phase_detail:
                    out["detail"] = self.phase_detail
                out["phase_elapsed_s"] = round(phase_elapsed, 1)
                if expect is not None:
                    out["phase_eta_s"] = round(
                        max(0.0, expect - phase_elapsed), 1
                    )
            return out

    # ---------------------------------------------------------- watcher

    def _ensure_watcher(self) -> None:
        with self._lock:
            if self._watcher is not None and self._watcher.is_alive():
                return
            self._watcher = threading.Thread(
                target=self._watch, name="build-progress", daemon=True
            )
            self._watcher.start()

    def _watch(self) -> None:
        from ..logger import sugar

        idle_since = time.monotonic()
        while True:
            time.sleep(LOG_EVERY_S)
            snap = self.snapshot()
            if snap is None or "phase" not in snap:
                # exit after a quiet period so test processes don't
                # accumulate immortal threads
                if time.monotonic() - idle_since > 120:
                    with self._lock:
                        self._watcher = None
                    return
                continue
            idle_since = time.monotonic()
            eta = snap.get("phase_eta_s")
            sugar().info(
                "build progress: phase %s %s%.0fs elapsed%s "
                "(build %.0fs, %d rows)",
                snap["phase"],
                ("[" + snap["detail"] + "] ") if snap.get("detail") else "",
                snap["phase_elapsed_s"],
                f", ~{eta:.0f}s left" if eta is not None else "",
                snap["elapsed_s"],
                snap["rows"],
            )


class _Phase:
    def __init__(self, tracker: BuildProgress, name: str, detail: str):
        self._t, self._name, self._detail = tracker, name, detail
        self._owns = False

    def __enter__(self):
        self._owns = self._t._phase_start(self._name, self._detail)
        return self

    def __exit__(self, *exc):
        if self._owns:
            self._t._phase_end(self._name)
        return False


tracker = BuildProgress()

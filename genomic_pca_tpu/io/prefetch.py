"""Host -> device prefetch pipeline with throughput telemetry.

TPU-native replacement for the reference's actor-based IoService
(/root/reference/src/prepare.rs:169-920).  The reference runs a pool of
BED-reader actor threads, autoscaled by a controller watching queue depth
and byte throughput (prepare.rs:733-861).  Here the same role — keeping
the compute engine fed — is a bounded prefetch pipeline:

* N worker threads fetch strips (disk decode) and `jax.device_put` them
  so host I/O and device compute overlap (double/triple buffering).
* The pool autoscales on the same signal family as the reference's
  controller: consumer starvation (queue empty on take) grows the pool,
  sustained full-queue idle shrinks it, within [1, max_workers], with a
  cooldown — the analog of prepare.rs:772-855's scale up/down rules.
* Telemetry mirrors `IoTaskMetrics { bytes_read }` (prepare.rs:247-254):
  bytes moved and a windowed throughput estimate, queryable at any time.
"""

from __future__ import annotations

import collections
import dataclasses
import logging
import threading
import time
from typing import Callable, Iterator, Optional, Tuple

log = logging.getLogger(__name__)


@dataclasses.dataclass
class PrefetchTelemetry:
    bytes_total: int = 0
    strips_total: int = 0
    consumer_waits: int = 0
    workers_high_water: int = 1

    def __repr__(self) -> str:  # pragma: no cover - cosmetic
        return (
            f"PrefetchTelemetry(bytes={self.bytes_total}, "
            f"strips={self.strips_total}, waits={self.consumer_waits}, "
            f"workers_hw={self.workers_high_water})"
        )


class StripPrefetcher:
    """Ordered prefetching iterator over `fetch(i) for i in range(n)`.

    `fetch` runs on worker threads and should return the device-ready
    payload (typically after `jax.device_put`) plus its host byte count.
    Results are delivered strictly in order.
    """

    def __init__(
        self,
        fetch: Callable[[int], Tuple[object, int]],
        n_strips: int,
        depth: int = 3,
        max_workers: int = 4,
        autoscale: bool = True,
        timeout_s: float = 60.0,
    ):
        # timeout_s mirrors the reference's DEFAULT_IO_OPERATION_TIMEOUT
        # of 60 s on every request/response (prepare.rs:180, 1161).
        self._fetch = fetch
        self.n_strips = n_strips
        self.depth = max(1, depth)
        self.max_workers = max(1, max_workers)
        self.autoscale = autoscale
        self.timeout_s = timeout_s
        self.telemetry = PrefetchTelemetry()
        self._results: dict = {}
        self._results_lock = threading.Condition()
        self._next_to_fetch = 0
        self._fetch_lock = threading.Lock()
        self._stop = threading.Event()
        self._workers: list = []
        self._target_workers = 1
        self._last_scale = 0.0
        self._window = collections.deque(maxlen=64)  # (t, bytes)

    # ---- worker machinery -------------------------------------------
    def _claim(self) -> Optional[int]:
        with self._fetch_lock:
            if self._next_to_fetch >= self.n_strips:
                return None
            i = self._next_to_fetch
            self._next_to_fetch += 1
            return i

    def _worker(self, wid: int) -> None:
        while not self._stop.is_set():
            # Respect shrink decisions: workers above target exit.
            if wid >= self._target_workers:
                return
            # Backpressure: don't run ahead of the consumer by > depth.
            with self._results_lock:
                while (
                    len(self._results) >= self.depth and not self._stop.is_set()
                ):
                    self._results_lock.wait(timeout=0.1)
            if self._stop.is_set():
                return
            i = self._claim()
            if i is None:
                return
            try:
                payload, nbytes = self._fetch(i)
                err = None
            except Exception as e:  # deliver the error in-order
                payload, nbytes, err = None, 0, e
            with self._results_lock:
                self._results[i] = (payload, err)
                self.telemetry.bytes_total += nbytes
                self.telemetry.strips_total += 1
                self._window.append((time.monotonic(), nbytes))
                self._results_lock.notify_all()

    def _ensure_workers(self) -> None:
        alive = [w for w in self._workers if w.is_alive()]
        self._workers = alive
        while len(self._workers) < self._target_workers:
            wid = len(self._workers)
            t = threading.Thread(
                target=self._worker, args=(wid,), daemon=True,
                name=f"prefetch-{wid}",
            )
            t.start()
            self._workers.append(t)
        self.telemetry.workers_high_water = max(
            self.telemetry.workers_high_water, len(self._workers)
        )

    def _maybe_scale(self, starved: bool) -> None:
        if not self.autoscale:
            return
        now = time.monotonic()
        if now - self._last_scale < 0.25:  # cooldown (reference: 2 s)
            return
        if starved and self._target_workers < self.max_workers:
            self._target_workers += 1
            self._last_scale = now
            log.debug("prefetch scale-up to %d workers", self._target_workers)
        elif not starved and self._target_workers > 1 and len(self._results) >= self.depth:
            self._target_workers -= 1
            self._last_scale = now
            log.debug("prefetch scale-down to %d workers", self._target_workers)

    # ---- consumer API -----------------------------------------------
    def __iter__(self) -> Iterator[object]:
        self._ensure_workers()
        try:
            for i in range(self.n_strips):
                deadline = time.monotonic() + self.timeout_s
                with self._results_lock:
                    starved = i not in self._results
                    if starved:
                        self.telemetry.consumer_waits += 1
                    while i not in self._results:
                        if time.monotonic() > deadline:
                            raise TimeoutError(
                                f"Strip {i} not produced within "
                                f"{self.timeout_s:.0f}s."
                            )
                        self._ensure_workers()
                        self._results_lock.wait(timeout=0.1)
                    payload, err = self._results.pop(i)
                    self._results_lock.notify_all()
                self._maybe_scale(starved)
                self._ensure_workers()
                if err is not None:
                    raise err
                yield payload
        finally:
            self._stop.set()
            with self._results_lock:
                self._results_lock.notify_all()

    def throughput_bps(self, window_s: float = 8.0) -> float:
        """Windowed bytes/sec (reference: 8 s window, prepare.rs:753-770)."""
        now = time.monotonic()
        pts = [(t, b) for t, b in self._window if now - t <= window_s]
        if not pts:
            return 0.0
        span = max(now - pts[0][0], 1e-6)
        return sum(b for _, b in pts) / span

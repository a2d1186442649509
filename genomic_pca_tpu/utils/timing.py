"""Per-stage wall-clock timing.

Mirrors the reference's stage-timing vectors logged at workflow end
(/root/reference/src/main.rs:237-243 for VCF, main.rs:434-442 for
EigenSNP).
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Dict, Iterator, List, Tuple

log = logging.getLogger(__name__)


class StageTimer:
    """Collects named stage durations and logs a summary table."""

    def __init__(self) -> None:
        self._stages: List[Tuple[str, float]] = []
        self._t0 = time.perf_counter()

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        start = time.perf_counter()
        try:
            yield
        finally:
            dur = time.perf_counter() - start
            self._stages.append((name, dur))
            log.info("stage '%s' completed in %.3fs", name, dur)

    def record(self, name: str, seconds: float) -> None:
        self._stages.append((name, seconds))

    @property
    def stages(self) -> Dict[str, float]:
        return dict(self._stages)

    def total(self) -> float:
        return time.perf_counter() - self._t0

    def log_summary(self, title: str = "Stage timings") -> None:
        log.info("%s:", title)
        for name, dur in self._stages:
            log.info("  %-40s %10.3fs", name, dur)
        log.info("  %-40s %10.3fs", "TOTAL", self.total())

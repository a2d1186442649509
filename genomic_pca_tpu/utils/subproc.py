"""Subprocess environment hygiene.

On shared single-accelerator pools (axon relay), EVERY Python interpreter
start claims a device grant via sitecustomize — including multiprocessing
pool workers that never touch the device.  Workers then queue for minutes
behind the parent's grant.  `host_only_children()` temporarily strips the
pool-claim trigger from os.environ so children spawned inside the context
start as plain host processes; the parent's own backend is unaffected
(its sitecustomize already ran).
"""

from __future__ import annotations

import contextlib
import os
from typing import Iterator

_GRANT_VARS = ("PALLAS_AXON_POOL_IPS",)


@contextlib.contextmanager
def host_only_children() -> Iterator[None]:
    saved = {}
    for var in _GRANT_VARS:
        if var in os.environ:
            saved[var] = os.environ.pop(var)
    try:
        yield
    finally:
        os.environ.update(saved)

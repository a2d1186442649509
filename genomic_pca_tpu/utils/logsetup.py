"""Logging setup with microsecond timestamps.

The reference initializes env_logger with µs timestamps and a CLI-chosen
level (/root/reference/src/main.rs:84-95, flag at main.rs:515-516).
"""

from __future__ import annotations

import logging

_LEVELS = {
    "off": logging.CRITICAL + 10,
    "error": logging.ERROR,
    "warn": logging.WARNING,
    "warning": logging.WARNING,
    "info": logging.INFO,
    "debug": logging.DEBUG,
    "trace": logging.DEBUG,
}


def setup_logging(level: str = "Info") -> None:
    lvl = _LEVELS.get(level.strip().lower())
    if lvl is None:
        lvl = logging.INFO
    logging.basicConfig(
        level=lvl,
        format="[%(asctime)s.%(msecs)03d %(levelname)s %(name)s] %(message)s",
        datefmt="%Y-%m-%dT%H:%M:%S",
        force=True,
    )

"""xplane (XProf) trace parsing: trace-derived on-device timings.

The relay/host wall-clock around a dispatch carries load-dependent
latency; the xplane trace records what the CHIP did.  Two views:

- `module_device_ms`: total device time of 'XLA Modules' line events —
  one event per executed module, whose duration is the on-device wall
  time of the whole dispatched program.  Dividing by the iteration
  count of a power loop gives a load-independent ms/iter (this is the
  measurement VALIDATION.md's kernel tables use).
- `device_op_table`: per-op totals across device planes (where the
  on-chip time goes: fused kernel vs DMA vs collectives).

Used by bench.py (trace-derived rates in the committed artifact) and
scripts/mfu_trace.py.
"""

from __future__ import annotations

import glob
from collections import defaultdict
from typing import List, Optional, Tuple


def _load_xplane_pb2():
    import importlib

    for modpath in (
        "xprof.protobuf.xplane_pb2",
        "tensorboard_plugin_profile.protobuf.xplane_pb2",
        "tensorflow.tsl.profiler.protobuf.xplane_pb2",
    ):
        try:
            return importlib.import_module(modpath)
        except ImportError:
            continue
    return None


def load_xspaces(trace_dir: str):
    """Parse every *.xplane.pb under trace_dir -> (spaces, err)."""
    paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    if not paths:
        return None, "no xplane.pb captured"
    xplane_pb2 = _load_xplane_pb2()
    if xplane_pb2 is None:
        return None, "xplane_pb2 proto unavailable"
    spaces = []
    for path in paths:
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as fh:
            xs.ParseFromString(fh.read())
        spaces.append(xs)
    return spaces, None


def _is_device_plane(name: str) -> bool:
    low = name.lower()
    return low.startswith("/device:") and "custom" not in low


def module_device_ms(trace_dir: str) -> Tuple[Optional[float], int, Optional[str]]:
    """Total 'XLA Modules' device time (ms) and module-event count.

    Module events cover each executed program's full on-device span, so
    overlapping per-op/DMA sub-timings are not double-counted.  Returns
    (total_ms, n_events, err); (None, 0, reason) when no device module
    events exist (e.g. CPU smoke runs).
    """
    spaces, err = load_xspaces(trace_dir)
    if spaces is None:
        return None, 0, err
    total_ps = 0
    count = 0
    for xs in spaces:
        for plane in xs.planes:
            if not _is_device_plane(plane.name):
                continue
            for line in plane.lines:
                if line.name != "XLA Modules":
                    continue
                for ev in line.events:
                    total_ps += ev.duration_ps
                    count += 1
    if count == 0:
        return None, 0, "no device 'XLA Modules' events"
    return total_ps / 1e9, count, None


def module_table(
    trace_dir: str,
) -> Tuple[Optional[List[Tuple[str, float, int]]], Optional[str]]:
    """Per-module device totals -> [(module_name, total_ms, count)].

    One 'XLA Modules' event per executed program: grouping by module
    name separates the per-strip kernel program of a streaming pass
    from the small finisher programs (quantize, QR), giving a direct
    on-device ms/strip for the dominant module.
    """
    spaces, err = load_xspaces(trace_dir)
    if spaces is None:
        return None, err
    totals = defaultdict(lambda: [0.0, 0])
    for xs in spaces:
        for plane in xs.planes:
            if not _is_device_plane(plane.name):
                continue
            ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                if line.name != "XLA Modules":
                    continue
                for ev in line.events:
                    name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                    totals[name][0] += ev.duration_ps / 1e9
                    totals[name][1] += 1
    if not totals:
        return None, "no device 'XLA Modules' events"
    rows = sorted(
        ((nm, t, c) for nm, (t, c) in totals.items()), key=lambda r: -r[1]
    )
    return rows, None


def device_op_table(
    trace_dir: str, top: int = 12
) -> Tuple[Optional[List[Tuple[str, float, int]]], Optional[str]]:
    """Best-effort per-op device totals -> [(op_name, total_us, count)]."""
    spaces, err = load_xspaces(trace_dir)
    if spaces is None:
        return None, err

    def collect(device_only: bool):
        totals = defaultdict(lambda: [0.0, 0])
        for xs in spaces:
            for plane in xs.planes:
                name = plane.name.lower()
                is_dev = (
                    "tpu" in name or "device" in name or "xla" in name
                ) and "host" not in name
                if device_only and not is_dev:
                    continue
                ev_meta = {
                    m.id: m.name for m in plane.event_metadata.values()
                }
                for line in plane.lines:
                    for ev in line.events:
                        op = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                        us = ev.duration_ps / 1e6
                        totals[op][0] += us
                        totals[op][1] += 1
        return totals

    totals = collect(device_only=True)
    if not totals:
        totals = collect(device_only=False)  # e.g. CPU smoke runs
    if not totals:
        return None, "xplane files contain no events"
    rows = sorted(
        ((op, t, c) for op, (t, c) in totals.items()),
        key=lambda r: -r[1],
    )[:top]
    return rows, None

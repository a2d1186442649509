"""Process resource preflight.

Equivalent of the reference's rlimit queries before spawning its actor
pool (/root/reference/src/main.rs:37-51, 253-267): log the soft limits
for open files and processes/threads and warn when the planned
parallelism approaches them.  Extended with a MEMORY preflight (no
reference analog): estimate the run's device-upload bytes against the
HBM and — on relay backends whose IFRT-proxy client retains a host
mirror of every upload for the life of the process — against host RAM,
and fail fast with an actionable message instead of OOM-killing the
host mid-run (three distinct OOM modes were discovered by crashing
125 GB hosts at biobank scale before this existed).
"""

from __future__ import annotations

import logging
import os
from typing import Optional

from genomic_pca_tpu.errors import PreflightError

log = logging.getLogger(__name__)


def rlimit_soft(name: str) -> int:
    """Soft limit for 'nofile' or 'nproc'; -1 if unavailable."""
    try:
        import resource

        res = {
            "nofile": resource.RLIMIT_NOFILE,
            "nproc": resource.RLIMIT_NPROC,
        }[name]
        soft, _hard = resource.getrlimit(res)
        return soft if soft != resource.RLIM_INFINITY else 1 << 30
    except (ImportError, KeyError, ValueError, OSError):
        return -1


def preflight(planned_threads: int) -> None:
    """Log limits; warn if planned parallelism is close to them."""
    nofile = rlimit_soft("nofile")
    nproc = rlimit_soft("nproc")
    log.info(
        "Resource preflight: RLIMIT_NOFILE(soft)=%s RLIMIT_NPROC(soft)=%s "
        "planned_threads=%d",
        nofile, nproc, planned_threads,
    )
    if 0 < nproc < planned_threads + 16:
        log.warning(
            "Planned thread count %d is close to the NPROC soft limit %d.",
            planned_threads, nproc,
        )
    if 0 < nofile < 64:
        log.warning("NOFILE soft limit %d is unusually low.", nofile)


def host_available_bytes() -> int:
    """MemAvailable from /proc/meminfo (bytes); -1 if unavailable."""
    override = os.environ.get("GENOMIC_PCA_HOST_BUDGET_BYTES")
    if override:
        try:
            return int(override)
        except ValueError:
            pass
    try:
        with open("/proc/meminfo") as fh:
            for ln in fh:
                if ln.startswith("MemAvailable:"):
                    return int(ln.split()[1]) * 1024
    except OSError:
        pass
    return -1


def relay_mirror_mode() -> bool:
    """True when device uploads are mirrored (and retained) in host RAM.

    Measured property of tunneled/relayed single-chip backends: the
    IFRT-proxy client keeps a host copy of EVERY device_put for the
    life of the process (RSS grows 1:1 with cumulative uploads, never
    freed).  Auto-detected from the relay pool environment;
    GENOMIC_PCA_RELAY_MIRROR=1/0 overrides either way.  Real TPU hosts
    stream through pinned buffers and return False.
    """
    env = os.environ.get("GENOMIC_PCA_RELAY_MIRROR", "auto").strip().lower()
    if env in ("1", "true", "yes", "on"):
        return True
    if env in ("0", "false", "no", "off"):
        return False
    if not any(k.startswith("PALLAS_AXON") for k in os.environ):
        return False
    try:
        import jax

        # The pool env var is machine-wide; a process that ended up on
        # the plain CPU backend (tests, JAX_PLATFORMS=cpu) has no relay.
        return jax.devices()[0].platform != "cpu"
    except Exception:  # pragma: no cover - backend init failure
        return True


def memory_preflight(
    per_pass_device_bytes: int,
    n_passes: int,
    resident: bool,
    device_budget_bytes: int,
    host_budget_bytes: Optional[int] = None,
    mirror: Optional[bool] = None,
    split_legs_available: bool = True,
    overhead_factor: float = 1.25,
) -> dict:
    """Estimate this PROCESS's device-upload bytes and fail fast when
    they cannot fit the relevant budget.

    * `per_pass_device_bytes` — bytes uploaded per full-matrix pass
      (packed/int8 genotype strips; the sketch/capture side buffers are
      second-order and covered by the safety margin).
    * `n_passes` — full-matrix passes THIS process will run (streaming
      container re-uploads the matrix every pass; a resident container
      uploads once, so callers pass n_passes=1 with resident=True).
    * On a relay backend (`relay_mirror_mode()`), cumulative uploads
      accrue in host RAM and must fit `host_budget_bytes` (default:
      MemAvailable); past 90% the run is rejected with the split-leg /
      smaller-cohort recommendation.  On real hosts only an advisory
      HBM log line is emitted (residency is already decided against the
      60% HBM rule upstream).

    Returns the estimate dict for logging/telemetry.
    """
    if mirror is None:
        mirror = relay_mirror_mode()
    if host_budget_bytes is None:
        host_budget_bytes = host_available_bytes()
    # overhead_factor covers what the genotype-strip estimate omits:
    # strip row-padding, basis/sketch uploads per pass, standardization
    # side buffers, and client bookkeeping.  1.25 is calibrated so the
    # measured-fatal monolithic 1M x 102,400 config (77 GB raw uploads
    # on a ~105 GB-available host; OOM-killed in round 4) is rejected
    # while its split legs (one ~26 GB pass per process) pass.
    total_uploads = int(
        per_pass_device_bytes * max(n_passes, 1) * overhead_factor
    )
    est = {
        "per_pass_device_bytes": int(per_pass_device_bytes),
        "n_passes": int(n_passes),
        "resident": bool(resident),
        "total_upload_bytes": int(total_uploads),
        "device_budget_bytes": int(device_budget_bytes),
        "host_budget_bytes": int(host_budget_bytes),
        "relay_mirror": bool(mirror),
    }
    log.info(
        "Memory preflight: %.2f GB/pass x %d pass(es) = %.2f GB uploads "
        "(%s container); HBM budget %.1f GB; host available %.1f GB; "
        "relay host-mirror %s.",
        per_pass_device_bytes / 1e9, n_passes, total_uploads / 1e9,
        "resident" if resident else "streamed",
        device_budget_bytes / 1e9,
        host_budget_bytes / 1e9 if host_budget_bytes > 0 else float("nan"),
        "ON" if mirror else "off",
    )
    if mirror and host_budget_bytes > 0:
        if total_uploads > 0.9 * host_budget_bytes:
            hints = []
            if n_passes > 1 and split_legs_available:
                hints.append(
                    "run the pipeline as split legs — one full-matrix "
                    "pass per process — via --eigensnp-checkpoint-dir "
                    "plus --eigensnp-stop-after-checkpoint stage2_basis "
                    "/ refine_pass_<p> legs and a final resume leg"
                )
            hints.append(
                "or reduce the cohort (--sample-keep-list / fewer "
                "samples): the per-pass upload scales with "
                "n_snps x n_samples"
            )
            raise PreflightError(
                f"Estimated device uploads for this process "
                f"({total_uploads / 1e9:.1f} GB = "
                f"{per_pass_device_bytes / 1e9:.1f} GB/pass x {n_passes} "
                f"pass(es) x {overhead_factor:g} overhead) exceed 90% of "
                f"available host RAM "
                f"({host_budget_bytes / 1e9:.1f} GB) on a relay backend "
                f"that retains a host mirror of every upload. "
                + "; ".join(hints) + "."
            )
        if total_uploads > 0.6 * host_budget_bytes:
            log.warning(
                "Memory preflight: estimated uploads (%.1f GB) exceed "
                "60%% of available host RAM (%.1f GB) on a relay "
                "backend — the run fits but leaves little headroom.",
                total_uploads / 1e9, host_budget_bytes / 1e9,
            )
    return est

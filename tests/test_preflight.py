"""Memory preflight (utils/system.py) — unit + forced-failure
integration coverage.

The preflight exists because biobank-scale runs on relay backends found
three OOM modes by killing 125 GB hosts; it turns those into a fast
actionable error (preflight culture of /root/reference/src/main.rs:253-267,
extended to memory — the reference has no memory preflight at all).
"""

import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np
import pytest

from genomic_pca_tpu.errors import PreflightError
from genomic_pca_tpu.utils.system import (
    host_available_bytes,
    memory_preflight,
    relay_mirror_mode,
)

REPO = Path(__file__).resolve().parent.parent


def test_host_available_bytes_reads_meminfo():
    b = host_available_bytes()
    # Either /proc/meminfo exists (linux: positive, plausible) or -1.
    assert b == -1 or b > 1 << 20


def test_host_budget_env_override(monkeypatch):
    monkeypatch.setenv("GENOMIC_PCA_HOST_BUDGET_BYTES", "123456789")
    assert host_available_bytes() == 123456789


def test_relay_mirror_env_override(monkeypatch):
    monkeypatch.setenv("GENOMIC_PCA_RELAY_MIRROR", "1")
    assert relay_mirror_mode() is True
    monkeypatch.setenv("GENOMIC_PCA_RELAY_MIRROR", "0")
    assert relay_mirror_mode() is False


def test_relay_mirror_auto_detects_pool_env(monkeypatch):
    monkeypatch.delenv("GENOMIC_PCA_RELAY_MIRROR", raising=False)
    for k in [k for k in os.environ if k.startswith("PALLAS_AXON")]:
        monkeypatch.delenv(k, raising=False)
    assert relay_mirror_mode() is False
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.0.0.1")
    # Pool env present, but this process runs the plain CPU backend
    # (conftest): no relay between it and its "device".
    assert relay_mirror_mode() is False


def test_preflight_passes_within_budget():
    est = memory_preflight(
        per_pass_device_bytes=1 << 30,
        n_passes=3,
        resident=False,
        device_budget_bytes=16 << 30,
        host_budget_bytes=100 << 30,
        mirror=True,
    )
    assert est["total_upload_bytes"] == int((3 << 30) * 1.25)
    assert est["relay_mirror"] is True


def test_preflight_rejects_over_host_budget_with_split_hint():
    with pytest.raises(PreflightError) as ei:
        memory_preflight(
            per_pass_device_bytes=30 << 30,
            n_passes=3,  # 90 GB of uploads
            resident=False,
            device_budget_bytes=16 << 30,
            host_budget_bytes=60 << 30,
            mirror=True,
        )
    msg = str(ei.value)
    assert "stop-after-checkpoint" in msg
    assert "reduce the cohort" in msg


def test_preflight_single_pass_failure_omits_split_hint():
    # When the process already runs a single pass (or split legs are
    # already in use), recommending split legs would be circular.
    with pytest.raises(PreflightError) as ei:
        memory_preflight(
            per_pass_device_bytes=90 << 30,
            n_passes=1,
            resident=False,
            device_budget_bytes=16 << 30,
            host_budget_bytes=60 << 30,
            mirror=True,
            split_legs_available=False,
        )
    msg = str(ei.value)
    assert "stop-after-checkpoint" not in msg
    assert "reduce the cohort" in msg


def test_preflight_no_mirror_never_raises():
    est = memory_preflight(
        per_pass_device_bytes=500 << 30,
        n_passes=5,
        resident=False,
        device_budget_bytes=16 << 30,
        host_budget_bytes=8 << 30,
        mirror=False,  # real TPU host: pinned-buffer streaming, no cap
    )
    assert est["relay_mirror"] is False


class _FakeCkpt:
    def __init__(self, present=()):
        self._present = set(present)

    def load(self, name):
        return {} if name in self._present else None

    def has(self, name):
        return name in self._present


class _Cfg:
    refine_passes = 2


def test_planned_passes_fresh_monolithic():
    from genomic_pca_tpu.models.eigensnp import _planned_matrix_passes

    passes = _planned_matrix_passes(_Cfg, _FakeCkpt(), None, False)
    assert passes == [
        "stages_1_2", "refine_pass_0", "refine_pass_1", "capture_finalize"
    ]


def test_planned_passes_split_legs_are_single_pass():
    from genomic_pca_tpu.models.eigensnp import _planned_matrix_passes

    # Leg 1: stop after stage2_basis -> only the stages-1+2 pass.
    assert _planned_matrix_passes(
        _Cfg, _FakeCkpt(), "stage2_basis", False
    ) == ["stages_1_2"]
    # Leg 2: resume past stages 1+2, stop after refine_pass_0.
    assert _planned_matrix_passes(
        _Cfg, _FakeCkpt(["stage2_basis"]), "refine_pass_0", False
    ) == ["refine_pass_0"]
    # Leg 3: resume past refine passes -> just the capture pass.
    assert _planned_matrix_passes(
        _Cfg, _FakeCkpt(["stage2_basis", "refine_pass_0", "refine_pass_1"]),
        None, False,
    ) == ["capture_finalize"]


def test_planned_passes_diagnostics_run_repeats_stages12():
    from genomic_pca_tpu.models.eigensnp import _planned_matrix_passes

    # Diagnostics runs never take the stage-1/2 skip (they need the
    # per-block intermediates), so the pass stays planned.
    passes = _planned_matrix_passes(
        _Cfg, _FakeCkpt(["stage2_basis"]), None, True
    )
    assert passes[0] == "stages_1_2"


def test_will_stream_and_estimate(tmp_path):
    from genomic_pca_tpu.config import DataPrepConfig
    from genomic_pca_tpu.io.bed import write_plink
    from genomic_pca_tpu.models.prepare import prepare_data

    rng = np.random.default_rng(3)
    g = rng.integers(0, 3, (64, 16)).astype(np.int8)
    write_plink(tmp_path / "fx", g, bp=np.arange(64) * 10 + 10,
                chrom=["1"] * 64)
    (tmp_path / "blocks.tsv").write_text("1 1 1000\n")
    prep = prepare_data(DataPrepConfig(
        bed_path=str(tmp_path / "fx"),
        ld_block_path=str(tmp_path / "blocks.tsv"),
    ))
    est = prep.estimate_resident_bytes()
    assert 0 < est < 1 << 20  # tiny fixture
    assert prep.will_stream(force_streaming=False) is False
    assert prep.will_stream(force_streaming=True) is True


def test_streamed_pass_estimate_is_packed_with_keep_list(tmp_path):
    """The preflight's streamed per-pass estimate must be the 2-bit
    packed upload even when a sample keep-list makes the RESIDENT
    estimate int8 (the streamed container re-packs kept columns on the
    host — a 4x overestimate here falsely rejects runs that fit)."""
    from genomic_pca_tpu.config import DataPrepConfig
    from genomic_pca_tpu.io.bed import write_plink
    from genomic_pca_tpu.models.prepare import prepare_data

    from genomic_pca_tpu.parallel.sharded import packed_cols

    rng = np.random.default_rng(7)
    n_samples = 2048
    g = rng.integers(0, 3, (64, n_samples)).astype(np.int8)
    write_plink(tmp_path / "fx", g, bp=np.arange(64) * 10 + 10,
                chrom=["1"] * 64)
    (tmp_path / "blocks.tsv").write_text("1 1 2000\n")
    keep = tmp_path / "keep.txt"
    keep.write_text("".join(f"sample{i}\n" for i in range(0, n_samples, 2)))
    prep = prepare_data(DataPrepConfig(
        bed_path=str(tmp_path / "fx"),
        ld_block_path=str(tmp_path / "blocks.tsv"),
        sample_keep_path=str(keep),
    ))
    d = prep.n_pca_snps
    n_kept = len(prep.qc_sample_indices)
    assert n_kept == n_samples // 2
    streamed = prep.estimate_streamed_pass_bytes()
    assert streamed == d * packed_cols(n_kept)  # 2-bit packed bytes
    # int8 resident estimate (capture fusion) is 4x the packed pass at
    # this lane-aligned size
    if prep.qc_capture is not None and not prep.qc_capture.packed:
        assert prep.estimate_resident_bytes() == 4 * streamed


def test_cli_forced_failure_is_fast_and_actionable(tmp_path):
    """1M x 131k-class config on a budget-limited relay host must die in
    seconds with the split-leg recommendation, not OOM-kill the host.
    (Scaled-down: tiny fixture, 1000-byte host budget.)"""
    from genomic_pca_tpu.io.bed import write_plink

    rng = np.random.default_rng(5)
    g = rng.integers(0, 3, (256, 32)).astype(np.int8)
    write_plink(tmp_path / "fx", g, bp=np.arange(256) * 10 + 10,
                chrom=["1"] * 256)
    (tmp_path / "blocks.tsv").write_text("1 1 3000\n")
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        GENOMIC_PCA_RELAY_MIRROR="1",
        GENOMIC_PCA_HOST_BUDGET_BYTES="1000",
        PYTHONPATH=str(REPO),
    )
    t0 = time.monotonic()
    r = subprocess.run(
        [sys.executable, "-m", "genomic_pca_tpu", "--eigensnp",
         "--bed-file", str(tmp_path / "fx"),
         "--ld-block-file", str(tmp_path / "blocks.tsv"),
         "-o", str(tmp_path / "out"),
         "--eigensnp-k-global", "4",
         "--eigensnp-min-subset-size", "32"],
        capture_output=True, text=True, env=env, timeout=120,
    )
    elapsed = time.monotonic() - t0
    assert r.returncode == 1
    combined = r.stdout + r.stderr
    assert "PreflightError" in combined or "exceed 90%" in combined
    assert "reduce the cohort" in combined
    assert elapsed < 100  # interpreter + jax import dominate; no passes ran
    assert not (tmp_path / "out.eigensnp.pca.tsv").exists()

"""REAL multi-process execution: distributed QC + per-process loading.

Runs scripts/validate_multiprocess_cpu.py, which forms an actual
2-process `jax.distributed` group (CPU backend, 2 devices each) and
checks the full EigenSNP pipeline — distributed QC allgather,
`from_local_rows` global-array assembly, shard_map+psum compute, and
cross-process output materialization — against the single-process run.

This covers the multi-host code paths `dryrun_multichip`'s virtual mesh
cannot: process groups, non-addressable global arrays, and the
coordination service.
"""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_two_process_eigensnp_matches_single():
    r = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "validate_multiprocess_cpu.py"),
         "--port", "12953"],
        capture_output=True, text=True, timeout=560, cwd=str(REPO),
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    result = json.loads(r.stdout.strip().splitlines()[-1])
    assert result["pass"]
    assert result["min_score_abs_r"] > 0.999
    assert result["min_loading_abs_r"] > 0.999


def test_two_process_host_qc_packed_load_matches_single():
    """qc_mode=host multi-process: per-range mmap QC counts + packed
    survivor upload per process, checked against the single-process run."""
    r = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "validate_multiprocess_cpu.py"),
         "--port", "12967", "--qc-mode", "host"],
        capture_output=True, text=True, timeout=560, cwd=str(REPO),
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    result = json.loads(r.stdout.strip().splitlines()[-1])
    assert result["pass"]
    assert result["min_score_abs_r"] > 0.999
    assert result["min_loading_abs_r"] > 0.999


def test_two_process_vcf_file_sharding_matches_single():
    """Per-host VCF file sharding: 2 real processes each parse only
    their own files (replicated parser is asserted unreachable) and the
    segmented global assembly matches the single-process workflow."""
    r = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "validate_multiprocess_vcf.py"),
         "--port", "12979"],
        capture_output=True, text=True, timeout=560, cwd=str(REPO),
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    result = json.loads(r.stdout.strip().splitlines()[-1])
    assert result["pass"]
    assert result["min_score_abs_r"] > 0.999


def test_four_process_eigensnp_degenerate_owner():
    """4 real processes, with the LAST process's scan range having ZERO
    post-QC survivors (monomorphic tail): the segmented assembly must
    carry an empty segment end-to-end and still match the
    single-process run (SURVEY §2.3 scaling ladder, zero-row-owner
    edge)."""
    r = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "validate_multiprocess_cpu.py"),
         "--nproc", "4", "--port", "12991", "--degenerate-tail"],
        capture_output=True, text=True, timeout=560, cwd=str(REPO),
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    result = json.loads(r.stdout.strip().splitlines()[-1])
    assert result["pass"]
    assert result["n_pca_snps"] <= 450  # the tail block really dropped
    assert result["min_score_abs_r"] > 0.999


def test_four_process_vcf_zero_file_owner():
    """4 real processes over 3 VCF files: round-robin ownership leaves
    process 3 with ZERO files; from_owned_units must assemble its empty
    contribution and match the single-process workflow."""
    r = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "validate_multiprocess_vcf.py"),
         "--nproc", "4", "--port", "12997"],
        capture_output=True, text=True, timeout=560, cwd=str(REPO),
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    result = json.loads(r.stdout.strip().splitlines()[-1])
    assert result["pass"]
    assert result["min_score_abs_r"] > 0.999

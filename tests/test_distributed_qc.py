"""Distributed (per-process range) SNP QC: range scan + allgather merge.

Multi-process execution needs a real multi-host slice; here we verify the
two building blocks single-process: (a) the range QC scan is exactly
consistent — concatenating arbitrary contiguous ranges reproduces the
full scan bit-for-bit, (b) the padded tiled-allgather merge trims
correctly (with one process, allgather is the identity).
"""

import numpy as np
import pytest

from genomic_pca_tpu.config import DataPrepConfig
from genomic_pca_tpu.io.bed import BedReader, write_plink
from genomic_pca_tpu.models.prepare import (
    _allgather_qc,
    _qc_snp_range,
    prepare_data,
)
from tests.conftest import make_genotypes


@pytest.fixture
def bed_and_cfg(tmp_path, rng):
    n_snps, n_samples = 700, 64
    geno = make_genotypes(rng, n_snps, n_samples, missing_rate=0.03)
    prefix = str(tmp_path / "dqc")
    write_plink(prefix, geno, bp=list(np.arange(1, n_snps + 1) * 10))
    block_file = tmp_path / "blocks.tsv"
    block_file.write_text(f"1 1 {n_snps * 10 + 10}\n")
    cfg = DataPrepConfig(
        bed_path=prefix,
        ld_block_path=str(block_file),
        min_call_rate=0.5,
        min_maf=0.01,
        max_hwe_p=1e-6,
        snp_chunk_size=100,
        qc_device_batch=200,
    )
    return BedReader(prefix), cfg


def test_range_scan_concatenation_is_exact(bed_and_cfg):
    bed, cfg = bed_and_cfg
    n = bed.n_snps
    full = _qc_snp_range(bed, cfg, None, bed.n_samples, 0, n)
    # Uneven ranges, including one not aligned to chunk/batch sizes.
    cuts = [0, 130, 450, 451, n]
    parts = [
        _qc_snp_range(bed, cfg, None, bed.n_samples, cuts[i], cuts[i + 1])
        for i in range(len(cuts) - 1)
    ]
    for j, name in enumerate(("keep", "mean", "std")):
        merged = np.concatenate([p[j] for p in parts])
        np.testing.assert_array_equal(merged, full[j], err_msg=name)


def test_empty_range(bed_and_cfg):
    bed, cfg = bed_and_cfg
    keep, mean, std = _qc_snp_range(bed, cfg, None, bed.n_samples, 300, 300)
    assert keep.shape == mean.shape == std.shape == (0,)


def test_allgather_merge_single_process(bed_and_cfg):
    bed, cfg = bed_and_cfg
    n = bed.n_snps
    keep, mean, std = _qc_snp_range(bed, cfg, None, bed.n_samples, 0, n)
    # Single-process ranges list; the local pads to the largest range
    # (here its own) and round-trips unchanged.
    k2, m2, s2 = _allgather_qc(keep, mean, std, [(0, n)])
    np.testing.assert_array_equal(k2, keep)
    np.testing.assert_array_equal(m2, mean)
    np.testing.assert_array_equal(s2, std)


def test_prepare_data_distributed_flag_single_process(bed_and_cfg, tmp_path):
    """distributed_qc=True must be a no-op with one process."""
    bed, cfg = bed_and_cfg
    import dataclasses

    prep_on = prepare_data(dataclasses.replace(cfg, distributed_qc=True))
    prep_off = prepare_data(dataclasses.replace(cfg, distributed_qc=False))
    np.testing.assert_array_equal(
        prep_on.pca_snp_orig_indices, prep_off.pca_snp_orig_indices
    )
    np.testing.assert_array_equal(prep_on.mean, prep_off.mean)
    np.testing.assert_array_equal(prep_on.std, prep_off.std)

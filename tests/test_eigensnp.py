"""EigenSNP pipeline: prepare + two-stage algorithm end-to-end."""

import numpy as np
import pytest

from genomic_pca_tpu.config import DataPrepConfig, EigenSnpConfig
from genomic_pca_tpu.io.bed import write_plink
from genomic_pca_tpu.models.eigensnp import compute_eigensnp_pca
from genomic_pca_tpu.models.exact import exact_pca_from_strips
from genomic_pca_tpu.models.prepare import prepare_data
from tests.conftest import make_genotypes


def _setup(
    tmp_path,
    rng,
    n_snps=500,
    n_samples=80,
    missing_rate=0.01,
    n_blocks=4,
    n_pops=3,
    fst=0.1,
):
    geno = make_genotypes(
        rng, n_snps, n_samples, missing_rate=missing_rate, n_pops=n_pops, fst=fst
    )
    prefix = str(tmp_path / "toy")
    bp = np.arange(1, n_snps + 1) * 10
    write_plink(prefix, geno, bp=list(bp))
    block_file = tmp_path / "blocks.tsv"
    edges = np.linspace(0, n_snps * 10 + 10, n_blocks + 1, dtype=int)
    lines = [f"1 {edges[i]+1} {edges[i+1]}" for i in range(n_blocks)]
    block_file.write_text("\n".join(lines) + "\n")
    cfg = DataPrepConfig(
        bed_path=prefix,
        ld_block_path=str(block_file),
        min_call_rate=0.5,
        min_maf=0.01,
        max_hwe_p=1e-6,
        snp_chunk_size=200,
    )
    return geno, prefix, cfg


def test_prepare_pipeline(tmp_path, rng):
    geno, prefix, cfg = _setup(tmp_path, rng)
    prep = prepare_data(cfg)
    assert prep.n_samples == 80
    assert 0 < prep.n_pca_snps <= 500
    assert len(prep.blocks) >= 1
    # moments align with data
    raw = prep.bed.read(prep.pca_snp_orig_indices)
    valid = raw != -127
    means = np.where(valid, raw, 0).sum(1) / valid.sum(1)
    np.testing.assert_allclose(prep.mean, means.astype(np.float32), rtol=1e-5)


def test_sample_keep_file(tmp_path, rng):
    geno, prefix, cfg = _setup(tmp_path, rng)
    keep = tmp_path / "keep.txt"
    keep.write_text("sample3\nsample10\nsample42\nnot_a_sample\n")
    import dataclasses

    cfg2 = dataclasses.replace(cfg, sample_keep_path=str(keep))
    prep = prepare_data(cfg2)
    assert prep.sample_ids == ["sample3", "sample10", "sample42"]
    assert list(prep.qc_sample_indices) == [3, 10, 42]


def test_eigensnp_concordance_vs_exact(tmp_path, rng):
    geno, prefix, cfg = _setup(
        tmp_path, rng, n_snps=800, n_samples=100, n_pops=8, fst=0.25
    )
    prep = prepare_data(cfg)
    algo = EigenSnpConfig(
        k_global=5,
        components_per_block=12,
        subset_factor=1.0,
        min_subset_size=10,
        max_subset_size=100_000,
        refine_passes=2,
        seed=2025,
        snp_strip_size=200,
    )
    res = compute_eigensnp_pca(prep, algo)
    assert res.scores.shape == (100, 5)
    assert res.loadings.shape == (prep.n_pca_snps, 5)

    # exact standardized PCA restricted to the same PCA SNP set
    raw = prep.bed.read(prep.pca_snp_orig_indices)
    exact = exact_pca_from_strips(
        iter([raw]), 100, k=5, config=cfg, scale=True, apply_qc=False
    )
    for j in range(5):
        r = np.corrcoef(res.scores[:, j], exact.scores[:, j])[0, 1]
        assert abs(r) > 0.999, f"PC{j+1}: |r|={abs(r):.6f}"

    # eigenvalues: ours sigma^2/(N-1); oracle sigma^2/D
    ratio = res.eigenvalues / exact.eigenvalues
    np.testing.assert_allclose(
        ratio, prep.n_pca_snps / (100 - 1), rtol=2e-2
    )


def test_eigensnp_deterministic(tmp_path, rng):
    geno, prefix, cfg = _setup(tmp_path, rng, n_snps=300, n_samples=50)
    prep = prepare_data(cfg)
    algo = EigenSnpConfig(k_global=3, min_subset_size=10, snp_strip_size=128)
    r1 = compute_eigensnp_pca(prep, algo)
    r2 = compute_eigensnp_pca(prep, algo)
    np.testing.assert_array_equal(r1.scores, r2.scores)
    np.testing.assert_array_equal(r1.loadings, r2.loadings)


def test_subset_smaller_than_n(tmp_path, rng):
    geno, prefix, cfg = _setup(
        tmp_path, rng, n_snps=400, n_samples=60, n_pops=5, fst=0.25
    )
    prep = prepare_data(cfg)
    algo = EigenSnpConfig(
        k_global=3,
        subset_factor=0.5,
        min_subset_size=10,
        max_subset_size=30,
        refine_passes=2,
        snp_strip_size=128,
    )
    res = compute_eigensnp_pca(prep, algo)
    # refinement recovers full-sample structure despite 30-sample subset
    raw = prep.bed.read(prep.pca_snp_orig_indices)
    exact = exact_pca_from_strips(
        iter([raw]), 60, k=3, config=cfg, scale=True, apply_qc=False
    )
    for j in range(2):
        r = np.corrcoef(res.scores[:, j], exact.scores[:, j])[0, 1]
        assert abs(r) > 0.995, f"PC{j+1}: |r|={abs(r):.6f}"


def test_diagnostics_collection(tmp_path, rng):
    geno, prefix, cfg = _setup(tmp_path, rng, n_snps=200, n_samples=40)
    prep = prepare_data(cfg)
    algo = EigenSnpConfig(
        k_global=3, min_subset_size=10, collect_diagnostics=True, snp_strip_size=128
    )
    res = compute_eigensnp_pca(prep, algo)
    assert res.diagnostics is not None
    assert len(res.diagnostics["blocks"]) == len(prep.blocks)
    assert res.diagnostics["global"]["k_global"] == 3


def test_no_blocks_raises(tmp_path, rng):
    geno, prefix, cfg = _setup(tmp_path, rng, n_snps=100, n_samples=30)
    empty_blocks = tmp_path / "empty.tsv"
    empty_blocks.write_text("9 1 10\n")  # wrong chromosome
    import dataclasses

    cfg2 = dataclasses.replace(cfg, ld_block_path=str(empty_blocks))
    prep = prepare_data(cfg2)
    algo = EigenSnpConfig(k_global=3)
    with pytest.raises(ValueError, match="No PCA SNPs"):
        compute_eigensnp_pca(prep, algo)

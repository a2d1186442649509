"""Exact-PCA oracle behaviors."""

import numpy as np
import pytest

from genomic_pca_tpu.config import DataPrepConfig
from genomic_pca_tpu.models.exact import exact_pca_from_strips
from tests.conftest import make_genotypes


def _strips(geno, size):
    for s in range(0, geno.shape[0], size):
        yield geno[s : s + size]


def test_matches_direct_eigh(rng):
    geno = make_genotypes(rng, 300, 40, missing_rate=0.0)
    cfg = DataPrepConfig(min_call_rate=0.0, min_maf=0.0, max_hwe_p=1.0)
    res = exact_pca_from_strips(_strips(geno, 64), 40, k=5, config=cfg)

    # direct dense reference (no missing, center-only, same QC)
    from genomic_pca_tpu.ops.qc import qc_strip

    qc = qc_strip(geno, 40, cfg)
    x = geno[qc.keep].astype(np.float64)
    x -= x.mean(axis=1, keepdims=True)
    gram = x.T @ x / qc.n_kept
    evals, evecs = np.linalg.eigh(gram)
    ref_scores = evecs[:, ::-1][:, :5] * np.sqrt(evals[::-1][:5])

    np.testing.assert_allclose(res.eigenvalues, evals[::-1][:5], rtol=1e-10)
    for j in range(5):
        r = np.corrcoef(res.scores[:, j], ref_scores[:, j])[0, 1]
        assert abs(r) > 1 - 1e-10


def test_strip_size_invariance(rng):
    geno = make_genotypes(rng, 257, 30, missing_rate=0.02)
    res_a = exact_pca_from_strips(_strips(geno, 17), 30, k=4)
    res_b = exact_pca_from_strips(_strips(geno, 257), 30, k=4)
    np.testing.assert_allclose(res_a.eigenvalues, res_b.eigenvalues, rtol=1e-12)
    np.testing.assert_allclose(res_a.scores, res_b.scores, rtol=1e-9, atol=1e-12)
    assert res_a.n_kept_variants == res_b.n_kept_variants


def test_k_clamped_to_n_minus_one(rng):
    geno = make_genotypes(rng, 100, 10)
    res = exact_pca_from_strips(_strips(geno, 50), 10, k=50)
    assert res.scores.shape == (10, 9)


def test_no_survivors_raises(rng):
    geno = np.zeros((20, 10), dtype=np.int8)  # all monomorphic
    with pytest.raises(ValueError, match="No variants passed QC"):
        exact_pca_from_strips(_strips(geno, 10), 10, k=3)


def test_scale_true_standardizes(rng):
    geno = make_genotypes(rng, 400, 32)
    cfg = DataPrepConfig(min_call_rate=0.0, min_maf=0.0, max_hwe_p=1.0)
    res_c = exact_pca_from_strips(_strips(geno, 100), 32, k=3, config=cfg, scale=False)
    res_s = exact_pca_from_strips(_strips(geno, 100), 32, k=3, config=cfg, scale=True)
    # Same leading structure, different eigenvalue scales
    r = np.corrcoef(res_c.scores[:, 0], res_s.scores[:, 0])[0, 1]
    assert abs(r) > 0.99
    assert not np.allclose(res_c.eigenvalues, res_s.eigenvalues)

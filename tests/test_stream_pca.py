"""StripedMatrix engine + streamed PCA vs dense/exact references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genomic_pca_tpu.config import DataPrepConfig
from genomic_pca_tpu.models.exact import exact_pca_from_strips
from genomic_pca_tpu.models.pca import streamed_pca, validate_k
from genomic_pca_tpu.ops.stream import StripedMatrix
from tests.conftest import make_genotypes


def _dense_standardized(geno, center_only=False):
    x = geno.astype(np.float64)
    valid = geno != -127
    xm = np.where(valid, x, np.nan)
    mean = np.nanmean(xm, axis=1)
    std = np.nanstd(xm, axis=1, ddof=1)
    x = np.where(valid, x, mean[:, None]) - mean[:, None]
    if not center_only:
        x /= np.where(std > 0, std, 1.0)[:, None]
    return x


def test_gram_apply_matches_dense(rng):
    geno = make_genotypes(rng, 300, 40, missing_rate=0.03)
    sm = StripedMatrix.from_arrays(iter([geno]), strip_size=128)
    assert sm.n_rows == 300
    a = _dense_standardized(geno)
    b = rng.standard_normal((40, 7)).astype(np.float32)
    ours = np.asarray(sm.gram_apply(jnp.asarray(b)))
    ref = a.T @ (a @ b)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-3)


def test_right_apply_and_tsq(rng):
    geno = make_genotypes(rng, 130, 30, missing_rate=0.02)
    sm = StripedMatrix.from_arrays(iter([geno[:70], geno[70:]]), strip_size=64)
    a = _dense_standardized(geno)
    b = rng.standard_normal((30, 5)).astype(np.float32)
    np.testing.assert_allclose(
        sm.right_apply(jnp.asarray(b)), a @ b, rtol=2e-4, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(sm.tsq_accumulate(jnp.asarray(b))),
        (a @ b).T @ (a @ b),
        rtol=3e-4,
        atol=5e-2,
    )


def test_center_only_mode(rng):
    geno = make_genotypes(rng, 90, 25)
    sm = StripedMatrix.from_arrays(iter([geno]), strip_size=64, center_only=True)
    a = _dense_standardized(geno, center_only=True)
    b = rng.standard_normal((25, 4)).astype(np.float32)
    np.testing.assert_allclose(sm.right_apply(jnp.asarray(b)), a @ b, rtol=2e-4, atol=2e-3)


def test_streamed_pca_concordance_with_oracle(rng):
    # 8 populations -> 7 well-separated structure PCs; concordance on the
    # first 5 (trailing PCs approach the noise floor where exact
    # eigenvectors rotate freely and |r| is meaningless).
    geno = make_genotypes(rng, 800, 60, missing_rate=0.01, n_pops=8, fst=0.25)
    cfg = DataPrepConfig(min_call_rate=0.0, min_maf=0.0, max_hwe_p=1.0)
    k = 5
    exact = exact_pca_from_strips(iter([geno]), 60, k=k, config=cfg, scale=False)

    sm = StripedMatrix.from_arrays(iter([geno]), strip_size=256, center_only=True)
    ours = streamed_pca(sm, k=k, n_oversamples=10, n_power_iter=8, seed=42)

    for j in range(k):
        r = np.corrcoef(ours.scores[:, j], exact.scores[:, j])[0, 1]
        assert abs(r) > 0.999, f"PC{j+1} concordance {abs(r)}"

    # eigenvalue cross-check: sigma^2 / kept == oracle eigenvalue
    sig_sq = ours.singular_values**2 / exact.n_kept_variants
    np.testing.assert_allclose(sig_sq, exact.eigenvalues, rtol=1e-3)


def test_streamed_pca_deterministic(rng):
    geno = make_genotypes(rng, 200, 30)
    sm = StripedMatrix.from_arrays(iter([geno]), strip_size=128)
    r1 = streamed_pca(sm, k=4, seed=7)
    r2 = streamed_pca(sm, k=4, seed=7)
    np.testing.assert_array_equal(r1.scores, r2.scores)


def test_loadings_reconstruction(rng):
    geno = make_genotypes(rng, 150, 40)
    sm = StripedMatrix.from_arrays(iter([geno]), strip_size=64)
    res = streamed_pca(sm, k=5, n_power_iter=6, seed=1, compute_loadings=True)
    assert res.loadings.shape == (150, 5)
    # loadings columns are unit-norm singular vectors
    norms = np.linalg.norm(res.loadings, axis=0)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)


def test_validate_k():
    with pytest.raises(ValueError, match="at least 2 samples"):
        validate_k(3, 1, 10)
    with pytest.raises(ValueError, match="at least 1 feature"):
        validate_k(3, 10, 0)
    with pytest.raises(ValueError, match="k must be >= 1"):
        validate_k(0, 10, 10)
    assert validate_k(50, 10, 20) == 10  # clamped


def test_strip_padding_invariance(rng):
    geno = make_genotypes(rng, 100, 20)
    sm_a = StripedMatrix.from_arrays(iter([geno]), strip_size=64)
    sm_b = StripedMatrix.from_arrays(iter([geno[:30], geno[30:]]), strip_size=100)
    b = jnp.asarray(rng.standard_normal((20, 3)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(sm_a.gram_apply(b)), np.asarray(sm_b.gram_apply(b)), rtol=1e-5, atol=1e-3
    )


def test_transform_new_samples(rng):
    """transform() projects held-out samples consistently with training."""
    from genomic_pca_tpu.models.pca import transform

    geno = make_genotypes(rng, 300, 60, n_pops=4, fst=0.3)
    train, test = geno[:, :45], geno[:, 45:]
    sm = StripedMatrix.from_arrays(iter([train]), strip_size=128)
    res = streamed_pca(sm, k=3, n_power_iter=6, seed=1, compute_loadings=True)

    # training moments
    mean = train.astype(np.float64).mean(axis=1)
    std = train.astype(np.float64).std(axis=1, ddof=1)

    # projecting the training samples themselves reproduces the scores
    self_proj = transform(train, res.loadings, mean, std)
    for j in range(3):
        r = np.corrcoef(self_proj[:, j], res.scores[:, j])[0, 1]
        assert abs(r) > 0.999

    # held-out samples from the same populations land in the same space
    new_proj = transform(test, res.loadings, mean, std)
    assert new_proj.shape == (15, 3)
    assert np.isfinite(new_proj).all()
    spread_train = np.std(res.scores[:, 0])
    assert np.abs(new_proj[:, 0]).max() < 10 * spread_train * np.sqrt(300)

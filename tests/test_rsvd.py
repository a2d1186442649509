"""Randomized SVD correctness vs exact decomposition."""

import jax
import jax.numpy as jnp
import numpy as np

from genomic_pca_tpu.ops.rsvd import exact_svd, rsvd, sign_canonicalize


def _concordance(a, b):
    """Per-column |correlation| between two matrices."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    a = a - a.mean(0)
    b = b - b.mean(0)
    num = (a * b).sum(0)
    den = np.sqrt((a**2).sum(0) * (b**2).sum(0))
    return np.abs(num / den)


def test_rsvd_matches_exact_lowrank(rng):
    m, n, true_rank, k = 300, 200, 12, 8
    u = rng.standard_normal((m, true_rank))
    v = rng.standard_normal((true_rank, n))
    scales = np.geomspace(100, 1, true_rank)
    x = jnp.asarray((u * scales) @ v, dtype=jnp.float32)

    key = jax.random.key(7)
    u_r, s_r, vt_r = rsvd(x, key, k=k, n_oversamples=10, n_power_iter=2)
    u_e, s_e, vt_e = exact_svd(x, k)

    np.testing.assert_allclose(np.asarray(s_r), np.asarray(s_e), rtol=1e-3)
    conc = _concordance(np.asarray(u_r), np.asarray(u_e))
    assert (conc > 0.999).all(), conc


def test_rsvd_deterministic(rng):
    x = jnp.asarray(rng.standard_normal((100, 80)), dtype=jnp.float32)
    key = jax.random.key(2025)
    out1 = rsvd(x, key, k=5)
    out2 = rsvd(x, key, k=5)
    for a, b in zip(out1, out2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_rsvd_different_seed_same_subspace(rng):
    m, n, k = 200, 150, 6
    u = rng.standard_normal((m, k * 2))
    x = jnp.asarray(u @ rng.standard_normal((k * 2, n)), dtype=jnp.float32)
    s1 = rsvd(x, jax.random.key(1), k=k, n_power_iter=3)[1]
    s2 = rsvd(x, jax.random.key(2), k=k, n_power_iter=3)[1]
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-3)


def test_sign_canonicalize():
    u = jnp.asarray(np.diag([1.0, -2.0, 3.0]))
    vt = jnp.asarray(np.ones((3, 4)))
    u2, vt2 = sign_canonicalize(u, vt)
    assert np.asarray(u2).max() > 0
    np.testing.assert_allclose(np.asarray(u2[1, 1]), 2.0)
    np.testing.assert_allclose(np.asarray(vt2[1]), -np.ones(4))


def test_rsvd_k_larger_than_rank(rng):
    x = jnp.asarray(
        rng.standard_normal((50, 3)) @ rng.standard_normal((3, 40)),
        dtype=jnp.float32,
    )
    u, s, vt = rsvd(x, jax.random.key(0), k=10, n_power_iter=2)
    s = np.asarray(s)
    assert s.shape == (10,)
    # trailing components sit at the f32 noise floor
    assert (s[3:] < s[0] * 1e-2).all()
    assert s[2] > s[0] * 0.01 or s[2] > 10 * s[3]

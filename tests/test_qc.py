"""QC chain tests against straightforward numpy reference computations."""

import numpy as np
import jax.numpy as jnp

from genomic_pca_tpu.config import DataPrepConfig
from genomic_pca_tpu.ops.qc import genotype_counts, qc_strip, snp_qc_from_counts
from genomic_pca_tpu.ops.hwe import hwe_chi2_p
from tests.conftest import make_genotypes


def _nan_view(strip):
    x = strip.astype(np.float64)
    x[strip == -127] = np.nan
    return x


def test_genotype_counts(rng):
    strip = make_genotypes(rng, 50, 33, missing_rate=0.15)
    n0, n1, n2, nv = (np.asarray(a) for a in genotype_counts(jnp.asarray(strip)))
    np.testing.assert_array_equal(n0, (strip == 0).sum(axis=1))
    np.testing.assert_array_equal(n1, (strip == 1).sum(axis=1))
    np.testing.assert_array_equal(n2, (strip == 2).sum(axis=1))
    np.testing.assert_array_equal(nv, (strip != -127).sum(axis=1))


def test_moments_match_nan_reference(rng):
    strip = make_genotypes(rng, 200, 101, missing_rate=0.05)
    cfg = DataPrepConfig(min_call_rate=0.0, min_maf=0.0, max_hwe_p=1.0, min_variance=0.0)
    qc = qc_strip(strip, 101, cfg)
    x = _nan_view(strip)
    ref_mean = np.nanmean(x, axis=1)
    ref_var = np.nanvar(x, axis=1, ddof=1)
    kept = qc.keep
    np.testing.assert_allclose(qc.mean[kept], ref_mean[kept].astype(np.float32), rtol=1e-6)
    np.testing.assert_allclose(
        qc.std[kept] ** 2, ref_var[kept].astype(np.float32), rtol=1e-5
    )


def test_call_rate_filter(rng):
    strip = make_genotypes(rng, 100, 50, missing_rate=0.0)
    # knock out 3 genotypes in row 7 -> call rate 47/50 = 0.94
    strip[7, :3] = -127
    cfg = DataPrepConfig(min_call_rate=0.95, min_maf=0.0, max_hwe_p=1.0)
    qc = qc_strip(strip, 50, cfg)
    assert not qc.keep[7]


def test_maf_filter_exact_threshold(rng):
    n = 100
    strip = np.ones((3, n), dtype=np.int8)
    strip[0] = 0
    strip[0, :10] = 1  # freq = 10/200 = 0.05
    strip[1] = 0
    strip[1, :9] = 1  # freq = 0.045
    strip[2] = np.asarray(make_genotypes(np.random.default_rng(0), 1, n), dtype=np.int8)
    cfg = DataPrepConfig(min_call_rate=0.0, min_maf=0.05, max_hwe_p=1.0)
    qc = qc_strip(strip, n, cfg)
    assert qc.keep[0]  # maf == threshold passes (>= semantics, prepare.rs:1298)
    assert not qc.keep[1]


def test_monomorphic_dropped():
    strip = np.zeros((2, 40), dtype=np.int8)
    strip[1] = 2
    cfg = DataPrepConfig(min_call_rate=0.0, min_maf=0.0, max_hwe_p=1.0)
    qc = qc_strip(strip, 40, cfg)
    assert not qc.keep.any()


def test_hwe_against_scipy():
    from scipy.stats import chi2 as chi2_dist

    cases = [(30, 40, 30), (90, 5, 5), (50, 0, 50), (10, 80, 10), (98, 2, 0)]
    for aa, ab, bb in cases:
        n = aa + ab + bb
        p = (2 * aa + ab) / (2 * n)
        q = 1 - p
        exp = np.array([n * p * p, 2 * n * p * q, n * q * q])
        obs = np.array([aa, ab, bb])
        ours = hwe_chi2_p(np.array([aa]), np.array([ab]), np.array([bb]))[0]
        if (exp < 1e-9).any():
            continue  # edge-case path tested separately
        stat = ((obs - exp) ** 2 / exp).sum()
        expected = 1.0 - chi2_dist.cdf(stat, 1)
        np.testing.assert_allclose(ours, expected, atol=1e-12)


def test_hwe_edge_cases():
    # zero samples -> 1.0
    assert hwe_chi2_p(np.array([0]), np.array([0]), np.array([0]))[0] == 1.0
    # monomorphic -> 1.0
    assert hwe_chi2_p(np.array([50]), np.array([0]), np.array([0]))[0] == 1.0
    # expected ~0 but observed > 0 -> 0.0: all-het extreme has exp>0, use
    # constructed case: p tiny but hom-minor observed
    p = hwe_chi2_p(np.array([0]), np.array([1]), np.array([10000]))
    assert 0.0 <= p[0] < 1.0
    # symmetry under allele swap
    a = hwe_chi2_p(np.array([30]), np.array([20]), np.array([50]))
    b = hwe_chi2_p(np.array([50]), np.array([20]), np.array([30]))
    np.testing.assert_allclose(a, b)


def test_hwe_filter_wiring(rng):
    # Extreme HWE violation: no hets at intermediate frequency.
    strip = np.zeros((1, 100), dtype=np.int8)
    strip[0, :50] = 2
    cfg_active = DataPrepConfig(min_call_rate=0.0, min_maf=0.0, max_hwe_p=1e-6)
    cfg_off = DataPrepConfig(min_call_rate=0.0, min_maf=0.0, max_hwe_p=1.0)
    assert not qc_strip(strip, 100, cfg_active).keep[0]
    assert qc_strip(strip, 100, cfg_off).keep[0]


def test_variance_filter():
    strip = np.zeros((1, 10), dtype=np.int8)
    strip[0, 0] = 1  # tiny but nonzero variance
    cfg = DataPrepConfig(min_call_rate=0.0, min_maf=0.0, max_hwe_p=1.0, min_variance=0.5)
    assert not qc_strip(strip, 10, cfg).keep[0]


def test_counts_int32_exact_large():
    # Histogram exactness at large N (would overflow f16/f32-naive sums)
    n = 1_000_000
    strip = np.full((1, n), 2, dtype=np.int8)
    n0, n1, n2, nv = (np.asarray(a) for a in genotype_counts(jnp.asarray(strip)))
    assert n2[0] == n and nv[0] == n
    qc = snp_qc_from_counts(n0, n1, n2, nv, n, DataPrepConfig(min_maf=0.0))
    assert qc.mean[0] == 0.0  # monomorphic -> dropped, mean zeroed
    assert not qc.keep[0]


def test_packed_host_counts_match_device(rng):
    """Host LUT counts == device packed reduction, including a partial
    trailing byte and extra 0x55 pad columns."""
    from genomic_pca_tpu.ops.qc import (
        genotype_counts_packed, genotype_counts_packed_host,
    )
    from genomic_pca_tpu.parallel.sharded import pack_int8_rows

    for n_samples in (37, 40, 127, 256):
        g = rng.integers(0, 3, size=(97, n_samples)).astype(np.int8)
        g[rng.random(g.shape) < 0.07] = -127
        packed = pack_int8_rows(g)
        # widen with inert pad columns like the device layout does
        wide = np.full((97, packed.shape[1] + 5), 0x55, dtype=np.uint8)
        wide[:, : packed.shape[1]] = packed
        host = genotype_counts_packed_host(wide, n_samples)
        dev = np.stack(
            [np.asarray(a) for a in
             genotype_counts_packed(jnp.asarray(packed), n_samples)],
            axis=1,
        )
        np.testing.assert_array_equal(host, dev)
        # and against the int8 truth
        n0, n1, n2, nv = (np.asarray(a) for a in genotype_counts(jnp.asarray(g)))
        np.testing.assert_array_equal(host, np.stack([n0, n1, n2, nv], axis=1))


def test_int8_host_counts_match_device(rng):
    from genomic_pca_tpu.ops.qc import genotype_counts_int8_host

    g = rng.integers(0, 3, size=(200, 61)).astype(np.int8)
    g[rng.random(g.shape) < 0.1] = -127
    host = genotype_counts_int8_host(g)
    dev = np.stack(
        [np.asarray(a) for a in genotype_counts(jnp.asarray(g))], axis=1
    )
    np.testing.assert_array_equal(host, dev)

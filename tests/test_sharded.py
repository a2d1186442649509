"""Multi-device sharded engine on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genomic_pca_tpu.models.pca import streamed_pca
from genomic_pca_tpu.ops.stream import StripedMatrix
from genomic_pca_tpu.parallel.mesh import make_mesh
from genomic_pca_tpu.parallel.sharded import ShardedMatrix
from tests.conftest import make_genotypes


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def _build(geno, mesh, mode="xla", tile_d=64, **kw):
    return ShardedMatrix.from_arrays(
        iter([geno]), mesh=mesh, mode=mode, tile_d=tile_d, **kw
    )


def test_sharded_matches_striped(rng):
    geno = make_genotypes(rng, 500, 40, missing_rate=0.02)
    sm = _build(geno, make_mesh())
    ref = StripedMatrix.from_arrays(iter([geno]), strip_size=64)
    b = jnp.asarray(rng.standard_normal((40, 6)).astype(np.float32))

    np.testing.assert_allclose(
        np.asarray(sm.gram_apply(b)), np.asarray(ref.gram_apply(b)),
        rtol=1e-4, atol=1e-2,
    )
    np.testing.assert_allclose(
        np.asarray(sm.tsq_accumulate(b)), np.asarray(ref.tsq_accumulate(b)),
        rtol=1e-4, atol=1e-1,
    )
    np.testing.assert_allclose(
        sm.right_apply(b), ref.right_apply(b), rtol=1e-4, atol=1e-2
    )


def test_pallas_interpret_matches_xla(rng):
    geno = make_genotypes(rng, 300, 30, missing_rate=0.03)
    mesh = make_mesh()
    sm_x = _build(geno, mesh, mode="xla")
    sm_p = _build(geno, mesh, mode="pallas_interpret", kernel_precision="f32")
    b = jnp.asarray(rng.standard_normal((30, 5)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(sm_p.gram_apply(b)), np.asarray(sm_x.gram_apply(b)),
        rtol=1e-4, atol=1e-2,
    )
    np.testing.assert_allclose(
        np.asarray(sm_p.tsq_accumulate(b)), np.asarray(sm_x.tsq_accumulate(b)),
        rtol=1e-4, atol=1e-1,
    )
    np.testing.assert_allclose(
        sm_p.right_apply(b), sm_x.right_apply(b), rtol=1e-4, atol=1e-2
    )


def test_sharded_device_count_invariance(rng):
    geno = make_genotypes(rng, 300, 30)
    sm1 = _build(geno, make_mesh(jax.devices()[:1]))
    sm8 = _build(geno, make_mesh())
    b = jnp.asarray(rng.standard_normal((30, 4)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(sm1.gram_apply(b)), np.asarray(sm8.gram_apply(b)),
        rtol=1e-5, atol=1e-3,
    )


def test_streamed_pca_on_sharded_matrix(rng):
    geno = make_genotypes(rng, 600, 50, n_pops=6, fst=0.25)
    sm = _build(geno, make_mesh())
    ref = StripedMatrix.from_arrays(iter([geno]), strip_size=128)
    r_sh = streamed_pca(sm, k=4, n_power_iter=6, seed=3, compute_loadings=True)
    r_st = streamed_pca(ref, k=4, n_power_iter=6, seed=3, compute_loadings=True)
    for j in range(4):
        r = np.corrcoef(r_sh.scores[:, j], r_st.scores[:, j])[0, 1]
        assert abs(r) > 0.9999
    np.testing.assert_allclose(
        r_sh.singular_values, r_st.singular_values, rtol=1e-4
    )
    assert r_sh.loadings.shape == (600, 4)


def test_padding_shapes(rng):
    # 70 rows, tile 64, 8 devices -> d_pad = 512; 20 samples -> n_pad 128
    geno = make_genotypes(rng, 70, 20)
    sm = _build(geno, make_mesh())
    assert sm.d_pad % (8 * sm.tile_d) == 0
    assert sm.n_pad % 128 == 0
    assert sm.n_rows == 70 and sm.n_samples == 20
    b = jnp.asarray(rng.standard_normal((20, 3)).astype(np.float32))
    assert sm.right_apply(b).shape == (70, 3)
    assert np.asarray(sm.gram_apply(b)).shape == (20, 3)
    assert np.asarray(sm.tsq_accumulate(b)).shape == (3, 3)


def test_missing_sample_padding_inert(rng):
    """Padded sample columns must not affect results."""
    geno = make_genotypes(rng, 100, 20)
    sm = _build(geno, make_mesh())
    ref = StripedMatrix.from_arrays(iter([geno]), strip_size=64)
    b = jnp.asarray(rng.standard_normal((20, 4)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(sm.gram_apply(b)), np.asarray(ref.gram_apply(b)),
        rtol=1e-4, atol=1e-2,
    )


def test_from_local_rows_matches_from_arrays(rng):
    """Single-process path through the multi-host constructor."""
    import jax.numpy as jnp

    geno = make_genotypes(rng, 200, 30, missing_rate=0.02)
    n1 = (geno == 1).sum(axis=1)
    n2 = (geno == 2).sum(axis=1)
    nv = n1 + n2 + (geno == 0).sum(axis=1)
    mean = np.where(nv > 0, (n1 + 2.0 * n2) / np.maximum(nv, 1), 0.0)
    ssd = (n1 + 4.0 * n2) - nv * mean * mean
    std = np.sqrt(np.where(nv >= 2, ssd / np.maximum(nv - 1, 1), 0.0))

    def read_rows(lo, hi):
        return geno[lo:hi], mean[lo:hi], std[lo:hi]

    mesh = make_mesh()
    sm_local = ShardedMatrix.from_local_rows(
        read_rows, n_rows=200, n_samples=30, mesh=mesh, mode="xla", tile_d=64
    )
    sm_pack = ShardedMatrix.from_arrays(
        iter([geno]), mesh=mesh, mode="xla", tile_d=64
    )
    b = jnp.asarray(rng.standard_normal((30, 4)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(sm_local.gram_apply(b)), np.asarray(sm_pack.gram_apply(b)),
        rtol=1e-4, atol=1e-2,
    )
    np.testing.assert_allclose(
        sm_local.right_apply(b), sm_pack.right_apply(b), rtol=1e-4, atol=1e-2
    )


def test_pca_core_matches_decomposed(rng):
    """Fused single-program PCA equals the decomposed pass sequence."""
    geno = make_genotypes(rng, 300, 40, n_pops=5, fst=0.25)
    sm = _build(geno, make_mesh())
    k, n_iter = 4, 5
    b0 = jnp.asarray(rng.standard_normal((40, k + 10)).astype(np.float32))

    v, sigma, evals, loadings = sm.pca_core(b0, n_iter, k)

    # decomposed: power_iterate -> tsq -> eigh -> right_apply
    q = sm.power_iterate(b0, n_iter)
    g = np.asarray(sm.tsq_accumulate(q))
    w_evals, w = np.linalg.eigh(g)
    order = np.argsort(-w_evals)
    sig_ref = np.sqrt(np.maximum(w_evals[order], 0))[:k]

    np.testing.assert_allclose(np.asarray(sigma), sig_ref, rtol=1e-4)
    assert loadings.shape == (300, k)
    np.testing.assert_allclose(
        np.linalg.norm(loadings, axis=0), np.ones(k), atol=1e-3
    )
    # scores == A^T @ loadings (definition check against dense math)
    from tests.test_stream_pca import _dense_standardized

    a = _dense_standardized(geno)
    scores = np.asarray(v) * np.asarray(sigma)[None, :]
    ref_scores = a.T @ loadings
    for j in range(k):
        r = np.corrcoef(scores[:, j], ref_scores[:, j])[0, 1]
        assert abs(r) > 0.9999


def test_auto_tile_d():
    from genomic_pca_tpu.parallel.sharded import auto_tile_d

    # modest sample counts keep the requested tile
    assert auto_tile_d(2048, 128, 512) == 512
    # bf16 mode (compare-free, no f32 intermediate) fits 1024 at N=2048,
    # f32 mode only 512 — both verified on hardware (scripts/tune_kernels.py)
    assert auto_tile_d(2048, 128, 1024, "bf16") == 1024
    assert auto_tile_d(2048, 128, 1024, "f32") == 512
    # growing N shrinks the tile...
    t = auto_tile_d(8192, 128, 512)
    assert 0 < t < 512
    # ...until no tile fits (biobank N) -> 0 means fall back to XLA
    assert auto_tile_d(524288, 128, 512) == 0


def test_wide_sample_axis_falls_back_to_xla(rng, monkeypatch):
    """A matrix wider than any VMEM tile must construct in xla mode."""
    from genomic_pca_tpu.parallel import sharded as sh

    monkeypatch.setattr(sh, "_default_mode", lambda: "pallas")
    geno = make_genotypes(rng, 64, 40)
    sm = sh.ShardedMatrix.from_arrays(
        iter([geno]), mesh=make_mesh(jax.devices()[:1]), tile_d=64
    )
    # 40 samples -> pallas fine (interpret would be needed on CPU, but
    # mode selection happens before compile; only check the decision)
    assert sm.mode in ("pallas", "xla")

    big_n = 600_000

    class FakeGeno:
        shape = (64, sh._round_up(big_n, 128))

    # decision logic only: auto_tile_d returns 0 => xla
    assert sh.auto_tile_d(sh._round_up(big_n, 128)) == 0


def test_pallas2d_interpret_matches_xla(rng):
    """2-D tiled kernel path (wide-N mode) matches XLA results."""
    geno = make_genotypes(rng, 300, 40, missing_rate=0.03)
    mesh = make_mesh()
    sm_x = _build(geno, mesh, mode="xla")
    sm_p = _build(
        geno, mesh, mode="pallas2d_interpret", kernel_precision="f32"
    )
    assert sm_p.tile_n == 128
    b = jnp.asarray(rng.standard_normal((40, 5)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(sm_p.gram_apply(b)), np.asarray(sm_x.gram_apply(b)),
        rtol=1e-4, atol=1e-2,
    )
    np.testing.assert_allclose(
        np.asarray(sm_p.tsq_accumulate(b)), np.asarray(sm_x.tsq_accumulate(b)),
        rtol=1e-4, atol=1e-1,
    )
    np.testing.assert_allclose(
        sm_p.right_apply(b), sm_x.right_apply(b), rtol=1e-4, atol=1e-2
    )


def test_q8_tile_sizing_contracts():
    """Pin the q8 steering-tile choosers' contracts: divisibility, the
    power-of-two growth, the VMEM-budget rejection, the hard caps, and
    the 2-D formula's ell>128 calibration guard (sharded.py round-5
    sizing; VALIDATION.md round 5 for the measured choices)."""
    from genomic_pca_tpu.parallel.sharded import (
        _grow_pow2_tile, _q8_packed_tile_d, _q8_packed_tile_d_2d,
        _row_pad_tile, vmem_budget_bytes,
    )

    budget = vmem_budget_bytes()

    # _grow_pow2_tile: base when nothing grows; respects divisibility.
    assert _grow_pow2_tile(1024, 1024, 4096, lambda t: 0) == 1024
    # d % (2*base) != 0 blocks doubling even with infinite budget
    assert _grow_pow2_tile(3 * 1024, 1024, 4096, lambda t: 0) == 1024
    # budget rejection: a step-cost exceeding VMEM stops growth
    assert _grow_pow2_tile(8192, 1024, 8192, lambda t: t * 1024) in (
        1024, 2048, 4096, 8192,
    )
    assert _grow_pow2_tile(
        8192, 1024, 8192, lambda t: budget + 1 if t > 1024 else 0
    ) == 1024

    # 1-D packed chooser at the bench shape (262,144-row shard, 512
    # packed cols, L=128): doubles to 2048 (the measured round-5
    # choice) and never beyond its cap.
    t1 = _q8_packed_tile_d(262_144, 512, 128, 1024)
    assert t1 == 2048
    # at a huge packed width nothing fits beyond base
    assert _q8_packed_tile_d(262_144, 65_536, 128, 1024) == 1024

    # 2-D chooser at the biobank-class shape (65,536 rows, 512-byte
    # column tile, L=128): the measured (4096, 512) choice.
    assert _q8_packed_tile_d_2d(65_536, 512, 128, 1024) == 4096
    # wider sketches are outside the calibrated envelope -> base tile
    assert _q8_packed_tile_d_2d(65_536, 512, 256, 1024) == 1024

    # Row-padding granule: packed q8 pads to 2*tile_d so every shard
    # divides the doubled steering tile; dense and non-q8 keep base.
    assert _row_pad_tile(1024, "q8", packed=True) == 2048
    assert _row_pad_tile(1024, "q8", packed=False) == 1024
    assert _row_pad_tile(1024, "bf16", packed=True) == 1024

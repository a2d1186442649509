"""Multi-device sharded engine on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from genomic_pca_tpu.models.pca import streamed_pca
from genomic_pca_tpu.ops.stream import StripedMatrix
from genomic_pca_tpu.parallel.mesh import make_mesh
from genomic_pca_tpu.parallel.sharded import ShardedMatrix
from tests.conftest import make_genotypes


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_matches_striped(rng):
    geno = make_genotypes(rng, 500, 40, missing_rate=0.02)
    mesh = make_mesh()
    sm = ShardedMatrix.from_arrays(iter([geno]), strip_size=64, mesh=mesh)
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


def test_sharded_device_count_invariance(rng):
    """Same bits regardless of mesh size (1 vs 8 devices) up to f32 assoc."""
    geno = make_genotypes(rng, 300, 30)
    mesh1 = make_mesh(jax.devices()[:1])
    mesh8 = make_mesh()
    sm1 = ShardedMatrix.from_arrays(iter([geno]), strip_size=64, mesh=mesh1)
    sm8 = ShardedMatrix.from_arrays(iter([geno]), strip_size=64, mesh=mesh8)
    b = jnp.asarray(rng.standard_normal((30, 4)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(sm1.gram_apply(b)), np.asarray(sm8.gram_apply(b)),
        rtol=1e-5, atol=1e-3,
    )


def test_streamed_pca_on_sharded_matrix(rng):
    geno = make_genotypes(rng, 600, 50, n_pops=6, fst=0.25)
    mesh = make_mesh()
    sm = ShardedMatrix.from_arrays(iter([geno]), strip_size=128, mesh=mesh)
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


def test_padding_to_mesh_multiple(rng):
    # 70 rows, strip 64 -> 2 strips -> rounded to 8 strips on 8 devices
    geno = make_genotypes(rng, 70, 20)
    sm = ShardedMatrix.from_arrays(iter([geno]), strip_size=64, mesh=make_mesh())
    assert sm.n_strips % 8 == 0
    assert sm.n_rows == 70
    b = jnp.asarray(rng.standard_normal((20, 3)).astype(np.float32))
    out = sm.right_apply(b)
    assert out.shape == (70, 3)

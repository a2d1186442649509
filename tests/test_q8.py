"""Quantized (int8-MXU) power-iteration path.

The q8 kernel runs the subspace-iteration passes on the int8 MXU (2x
the bf16 rate) with standardization hoisted to exact rank-1/diagonal
corrections; the driver polishes with the exact bf16 kernel before the
Rayleigh-Ritz (parallel/sharded.py `power_loop`).  These tests pin:

1. the kernel against the exact quantization model (interpret mode),
2. end-to-end PC concordance of kernel_precision="q8" vs the float64
   oracle — including missing genotypes, whose sentinel the quantized
   passes approximate as raw 0 (ops/pallas_kernels.py q8 notes).
"""

import jax
import jax.numpy as jnp
import numpy as np

from genomic_pca_tpu.models.pca import streamed_pca
from genomic_pca_tpu.ops import pallas_kernels as pk
from genomic_pca_tpu.parallel.mesh import make_mesh
from genomic_pca_tpu.parallel.sharded import ShardedMatrix
from tests.conftest import make_genotypes


def _quant_model_reference(g, iv, u, bq, sb, tile_d):
    """Host float64 replay of the kernel's exact quantization model."""
    g0 = np.maximum(g, 0).astype(np.float64)
    a = iv * g0 - u  # (d, n) operator applied to dequantized basis
    y = a @ (bq.astype(np.float64) * sb)
    t = np.zeros((g.shape[1], bq.shape[1]))
    for lo in range(0, g.shape[0], tile_d):
        z = iv[lo : lo + tile_d] * y[lo : lo + tile_d]
        sz = np.abs(z).max() / 127.0 + 1e-30
        z8 = np.clip(np.round(z / sz), -127, 127)
        t += g0[lo : lo + tile_d].T @ z8 * sz
    return t - (u * y).sum(axis=0)[None, :]


def test_fused_gram_q8_matches_quant_model(rng):
    d, n, ell = 512, 256, 128
    g = make_genotypes(rng, d, n, missing_rate=0.02)
    iv = rng.uniform(0.5, 2.0, (d, 1)).astype(np.float32)
    u = rng.uniform(0.0, 2.0, (d, 1)).astype(np.float32)
    b = rng.standard_normal((n, ell)).astype(np.float32)
    sb = np.float32(np.abs(b).max() / 127.0)
    bq = np.clip(np.round(b / sb), -127, 127).astype(np.int8)
    csum = (bq.astype(np.float32).sum(axis=0) * sb)[None, :]
    out, ru = pk.fused_gram_q8(
        jnp.asarray(g), jnp.asarray(iv), jnp.asarray(u), jnp.asarray(bq),
        jnp.asarray(sb).reshape(1, 1), jnp.asarray(csum),
        tile_d=128, interpret=True,
    )
    t = np.asarray(out) - np.asarray(ru)
    t_ref = _quant_model_reference(g, iv, u, bq, sb, tile_d=128)
    np.testing.assert_allclose(t, t_ref, rtol=1e-4, atol=1e-2)


def _exact_pcs(g, k):
    valid = g != -127
    g0 = np.where(valid, g, 0).astype(np.float64)
    cnt = valid.sum(axis=1)
    mean = g0.sum(axis=1) / cnt
    ssd = (((g0 - mean[:, None]) ** 2) * valid).sum(axis=1)
    std = np.sqrt(ssd / (cnt - 1)) + 1e-12
    a = np.where(valid, (g0 - mean[:, None]) / std[:, None], 0.0)
    evals, evecs = np.linalg.eigh(a.T @ a)
    return evecs[:, ::-1][:, :k], evals[::-1][:k]


def test_q8_pca_concordance_vs_f64(rng):
    # 8 pops -> k=6 separated PCs; 2% missing exercises the sentinel
    # approximation in the quantized passes.
    d, n, k = 1024, 192, 6
    g = make_genotypes(rng, d, n, missing_rate=0.02, n_pops=8, fst=0.12)
    v_true, _ = _exact_pcs(g, k)
    mesh = make_mesh()
    sm = ShardedMatrix.from_arrays(
        iter([g]), mesh=mesh, mode="pallas_interpret",
        kernel_precision="q8", tile_d=128,
    )
    res = streamed_pca(sm, k=k, n_power_iter=6, seed=11)
    for i in range(k):
        v = res.scores[:, i] / np.linalg.norm(res.scores[:, i])
        r = abs(float(np.dot(v, v_true[:, i])))
        assert r > 0.999, (i, r)


def test_q8_matches_bf16_path(rng):
    """q8 and plain-bf16 containers agree on the same data (no missing)."""
    d, n, k = 768, 128, 4
    g = make_genotypes(rng, d, n, missing_rate=0.0, n_pops=6, fst=0.15)
    mesh = make_mesh()
    kw = dict(mesh=mesh, mode="pallas_interpret", tile_d=128)
    sm_b = ShardedMatrix.from_arrays(iter([g]), kernel_precision="bf16", **kw)
    sm_q = ShardedMatrix.from_arrays(iter([g]), kernel_precision="q8", **kw)
    rb = streamed_pca(sm_b, k=k, n_power_iter=5, seed=3)
    rq = streamed_pca(sm_q, k=k, n_power_iter=5, seed=3)
    for i in range(k):
        r = abs(float(
            np.dot(rb.scores[:, i], rq.scores[:, i])
            / (np.linalg.norm(rb.scores[:, i])
               * np.linalg.norm(rq.scores[:, i]))
        ))
        assert r > 0.9999, (i, r)
    np.testing.assert_allclose(
        rq.eigenvalues, rb.eigenvalues, rtol=5e-3
    )


def test_q8_packed_matches_dense_q8(rng):
    """Packed (2-bit) q8 container agrees with the dense q8 container."""
    from genomic_pca_tpu.parallel.sharded import pack_int8_rows

    d, n, k = 512, 128, 4
    g = make_genotypes(rng, d, n, missing_rate=0.02, n_pops=6, fst=0.15)
    valid = g != -127
    g0 = np.where(valid, g, 0).astype(np.float64)
    cnt = valid.sum(axis=1)
    mean = (g0.sum(axis=1) / cnt).astype(np.float32)
    std = np.sqrt(
        (((g0 - mean[:, None]) ** 2) * valid).sum(axis=1) / (cnt - 1)
    ).astype(np.float32)
    mesh = make_mesh()
    kw = dict(mesh=mesh, mode="pallas_interpret", tile_d=128,
              kernel_precision="q8")
    sm_d = ShardedMatrix.from_arrays(
        iter([g]), means=[mean], stds=[std], **kw
    )
    sm_p = ShardedMatrix.from_packed_rows(
        pack_int8_rows(g), mean, std, n, **kw
    )
    assert sm_p.packed and not sm_d.packed
    rd = streamed_pca(sm_d, k=k, n_power_iter=5, seed=3)
    rp = streamed_pca(sm_p, k=k, n_power_iter=5, seed=3)
    for i in range(k):
        r = abs(float(
            np.dot(rd.scores[:, i], rp.scores[:, i])
            / (np.linalg.norm(rd.scores[:, i])
               * np.linalg.norm(rp.scores[:, i]))
        ))
        assert r > 0.9999, (i, r)

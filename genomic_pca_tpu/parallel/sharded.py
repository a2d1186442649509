"""Variant-sharded streamed matrix: shard_map + scan + psum.

The production container for the standardized genotype operator A (D x N):

* Genotypes stack into a 3-D int8 array (n_strips, strip_size, n_samples)
  sharded over the strip axis of a 1-D mesh ("v"); per-SNP mean / inv_std
  vectors shard identically.  Padding rows (both within the last strip
  and to round the strip count up to a mesh multiple) carry inv_std = 0
  and standardize to zero.
* Each linear-algebra pass runs under `shard_map`: a `lax.scan` over the
  local strips does fused standardize + MXU matmuls entirely on-device
  (one XLA program — no per-strip Python dispatch), then a single `psum`
  over "v" merges the (n_samples x l) or (l x l) partial results.  Only
  those small condensed factors ever cross ICI — the genotype shards
  never move.
* On a 1-device mesh the same code is the optimized single-chip path
  (the scan replaces the strip loop of ops/stream.py).

This is the TPU-native replacement for everything the reference does
with rayon worker pools and flume channels (SURVEY §2.3's required
equivalence table).
"""

from __future__ import annotations

from functools import partial
from typing import Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from genomic_pca_tpu.parallel.mesh import VARIANT_AXIS, make_mesh

MISSING = -127
_PRECISION = jax.lax.Precision.HIGHEST


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32, precision=_PRECISION)


def _standardize(g_i8, mean, inv_std):
    g = g_i8.astype(jnp.float32)
    valid = g_i8 != MISSING
    x = g * inv_std[:, None] + (-mean * inv_std)[:, None]
    return jnp.where(valid, x, 0.0)


class ShardedMatrix:
    """Standardized genotype operator sharded over the variant axis."""

    def __init__(
        self,
        geno: jax.Array,  # (n_strips, strip, N) int8, sharded P(v, None, None)
        mean: jax.Array,  # (n_strips, strip) f32, sharded P(v, None)
        inv_std: jax.Array,  # (n_strips, strip) f32
        n_rows: int,
        mesh: Mesh,
    ):
        self.geno = geno
        self.mean = mean
        self.inv_std = inv_std
        self.n_rows = n_rows
        self.mesh = mesh
        self.n_strips, self.strip_size, self.n_samples = geno.shape
        self._build_kernels()

    # ------------------------------------------------------------------
    @staticmethod
    def from_arrays(
        geno_strips: Iterator[np.ndarray],
        means: Optional[List[np.ndarray]] = None,
        stds: Optional[List[np.ndarray]] = None,
        strip_size: int = 2048,
        center_only: bool = False,
        mesh: Optional[Mesh] = None,
    ) -> "ShardedMatrix":
        """Pack host int8 arrays into the sharded 3-D layout.

        Moments are computed exactly from integer histograms when not
        supplied (see ops/qc.py).
        """
        from genomic_pca_tpu.ops.qc import genotype_counts

        mesh = mesh or make_mesh()
        n_dev = mesh.devices.size

        gs: List[np.ndarray] = []
        ms: List[np.ndarray] = []
        ss: List[np.ndarray] = []
        n_samples = None
        for i, g in enumerate(geno_strips):
            g = np.asarray(g, dtype=np.int8)
            n_samples = g.shape[1] if n_samples is None else n_samples
            if means is not None and stds is not None:
                m = np.asarray(means[i], dtype=np.float32)
                s = np.asarray(stds[i], dtype=np.float32)
            else:
                n0, n1, n2, nv = (
                    np.asarray(a) for a in genotype_counts(jnp.asarray(g))
                )
                with np.errstate(divide="ignore", invalid="ignore"):
                    m = np.where(nv > 0, (n1 + 2.0 * n2) / np.maximum(nv, 1), 0.0)
                    ssd = (n1 + 4.0 * n2) - nv * m * m
                    var = np.where(nv >= 2, ssd / np.maximum(nv - 1, 1), 0.0)
                    s = np.sqrt(np.maximum(var, 0.0))
                m = m.astype(np.float32)
                s = s.astype(np.float32)
            if center_only:
                s = np.ones_like(m)
            gs.append(g)
            ms.append(m)
            ss.append(s)
        if n_samples is None:
            raise ValueError("No strips provided.")

        g_all = np.concatenate(gs, axis=0)
        m_all = np.concatenate(ms, axis=0)
        s_all = np.concatenate(ss, axis=0)
        n_rows = g_all.shape[0]

        n_strips = max(1, -(-n_rows // strip_size))
        n_strips = -(-n_strips // n_dev) * n_dev  # round up to mesh multiple
        pad_rows = n_strips * strip_size - n_rows
        if pad_rows:
            g_all = np.concatenate(
                [g_all, np.zeros((pad_rows, n_samples), dtype=np.int8)], axis=0
            )
            m_all = np.concatenate([m_all, np.zeros(pad_rows, dtype=np.float32)])
            s_all = np.concatenate([s_all, np.zeros(pad_rows, dtype=np.float32)])

        inv_all = np.where(
            s_all > 0, 1.0 / np.where(s_all > 0, s_all, 1.0), 0.0
        ).astype(np.float32)

        g3 = g_all.reshape(n_strips, strip_size, n_samples)
        m2 = m_all.reshape(n_strips, strip_size).astype(np.float32)
        i2 = inv_all.reshape(n_strips, strip_size)

        sh3 = NamedSharding(mesh, P(VARIANT_AXIS, None, None))
        sh2 = NamedSharding(mesh, P(VARIANT_AXIS, None))
        return ShardedMatrix(
            geno=jax.device_put(g3, sh3),
            mean=jax.device_put(m2, sh2),
            inv_std=jax.device_put(i2, sh2),
            n_rows=n_rows,
            mesh=mesh,
        )

    # ------------------------------------------------------------------
    def _build_kernels(self) -> None:
        mesh = self.mesh
        vspec = P(VARIANT_AXIS, None, None)
        mspec = P(VARIANT_AXIS, None)
        rep = P(None, None)

        def local_scan(g3, m2, i2, b, want_gram: bool):
            l = b.shape[1]
            n = b.shape[0]

            def body(acc, xs):
                g, m, iv = xs
                a = _standardize(g, m, iv)
                w = _dot(a, b)  # (strip, l)
                if want_gram:
                    return acc + _dot(a.T, w), None
                return acc + _dot(w.T, w), None

            shape = (n, l) if want_gram else (l, l)
            # The initial carry is device-invariant while the scanned body
            # makes it shard-varying over "v" — pcast marks it as such for
            # shard_map's varying-manual-axes type check.
            init = jax.lax.pcast(
                jnp.zeros(shape, dtype=jnp.float32), (VARIANT_AXIS,), to="varying"
            )
            acc, _ = jax.lax.scan(body, init, (g3, m2, i2))
            return jax.lax.psum(acc, VARIANT_AXIS)

        @jax.jit
        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(vspec, mspec, mspec, rep),
            out_specs=rep,
        )
        def gram_apply_k(g3, m2, i2, b):
            return local_scan(g3, m2, i2, b, want_gram=True)

        @jax.jit
        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(vspec, mspec, mspec, rep),
            out_specs=rep,
        )
        def tsq_k(g3, m2, i2, b):
            return local_scan(g3, m2, i2, b, want_gram=False)

        @jax.jit
        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(vspec, mspec, mspec, rep),
            out_specs=vspec,
        )
        def right_apply_k(g3, m2, i2, b):
            def body(_, xs):
                g, m, iv = xs
                a = _standardize(g, m, iv)
                return None, _dot(a, b)

            _, out = jax.lax.scan(body, None, (g3, m2, i2))
            return out  # (local_strips, strip, l)

        self._gram_apply_k = gram_apply_k
        self._tsq_k = tsq_k
        self._right_apply_k = right_apply_k

    # ---- public passes ----------------------------------------------
    def gram_apply(self, b: jax.Array) -> jax.Array:
        """A^T (A B): (N, l), replicated."""
        return self._gram_apply_k(self.geno, self.mean, self.inv_std, b)

    def tsq_accumulate(self, b: jax.Array) -> jax.Array:
        """(A B)^T (A B): (l, l), replicated."""
        return self._tsq_k(self.geno, self.mean, self.inv_std, b)

    def right_apply(self, b: jax.Array) -> np.ndarray:
        """A B on host with padding removed: (D, l)."""
        out = self._right_apply_k(self.geno, self.mean, self.inv_std, b)
        flat = np.asarray(out).reshape(self.n_strips * self.strip_size, -1)
        return flat[: self.n_rows]

"""Host-streamed standardized matrix for bigger-than-HBM datasets.

Same duck-typed contract as parallel/sharded.ShardedMatrix (n_samples,
n_rows, gram_apply, tsq_accumulate, right_apply) but the int8 strips live
on HOST (disk via BedReader, or RAM) and stream through the prefetch
pipeline (io/prefetch.py) each pass, double-buffered against device
compute.  This is the reference's lazy accessor + IoService combination
(/root/reference/src/prepare.rs:169-920, 1838-2029) re-shaped for TPU:
whole strips DMA to HBM ahead of use and run through the fused Pallas
kernels.

Use when D x N int8 exceeds device HBM; otherwise prefer ShardedMatrix
(strips resident, no re-read per pass).
"""

from __future__ import annotations

import logging
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from genomic_pca_tpu.io.prefetch import StripPrefetcher
from genomic_pca_tpu.ops import pallas_kernels as pk

log = logging.getLogger(__name__)

MISSING = -127


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _xla_strip_gram(g, m, iv, b):
    from genomic_pca_tpu.ops.stream import _strip_gram_apply

    return _strip_gram_apply(g, m[:, 0], iv[:, 0], b)


def _xla_strip_right(g, m, iv, b):
    from genomic_pca_tpu.ops.stream import _strip_right_apply

    return _strip_right_apply(g, m[:, 0], iv[:, 0], b)


class StreamingMatrix:
    """Standardized genotype operator streamed from host per pass.

    `strip_source(i)` returns host arrays (geno int8 (S, N), mean (S,),
    std (S,)) for strip i; every strip must have the same (padded) shape.
    """

    def __init__(
        self,
        strip_source: Callable[[int], Tuple[np.ndarray, np.ndarray, np.ndarray]],
        n_strips: int,
        n_rows: int,
        n_samples: int,
        strip_size: int,
        mode: Optional[str] = None,
        tile_d: int = 1024,
        kernel_precision: str = "bf16",
        prefetch_depth: int = 3,
        prefetch_workers: int = 4,
    ):
        self._source = strip_source
        self.n_strips = n_strips
        self.n_rows = n_rows
        self.n_samples = n_samples
        self.strip_size = strip_size
        if mode is None:
            mode = "pallas" if jax.devices()[0].platform == "tpu" else "xla"
        self.n_pad = _round_up(n_samples, 128)
        if mode == "pallas":
            from genomic_pca_tpu.parallel.sharded import auto_tile_d

            fitted = auto_tile_d(
                self.n_pad, requested=tile_d, precision=kernel_precision
            )
            if fitted == 0:
                mode = "xla"  # sample axis too wide for a VMEM row tile
            else:
                tile_d = fitted
        self.mode = mode
        self.tile_d = tile_d
        self.kernel_precision = kernel_precision
        self.prefetch_depth = prefetch_depth
        self.prefetch_workers = prefetch_workers
        self.last_telemetry = None

    # ------------------------------------------------------------------
    def _fetch(self, i: int):
        g, m, s = self._source(i)
        g = np.asarray(g, dtype=np.int8)
        m = np.asarray(m, dtype=np.float32)
        s = np.asarray(s, dtype=np.float32)
        from genomic_pca_tpu.parallel.sharded import inv_std_of

        inv = inv_std_of(s).astype(np.float32)
        if g.shape[1] < self.n_pad:  # pad samples with missing
            pad = self.n_pad - g.shape[1]
            g = np.pad(g, ((0, 0), (0, pad)), constant_values=MISSING)
        payload = (
            jax.device_put(g),
            jax.device_put(m.reshape(-1, 1)),
            jax.device_put(inv.reshape(-1, 1)),
        )
        return payload, g.nbytes

    def _prefetcher(self) -> StripPrefetcher:
        p = StripPrefetcher(
            self._fetch,
            self.n_strips,
            depth=self.prefetch_depth,
            max_workers=self.prefetch_workers,
        )
        self.last_telemetry = p.telemetry
        return p

    def _pad_b(self, b: jax.Array) -> jax.Array:
        n, ell = b.shape
        ell_pad = _round_up(ell, 128) if self.mode == "pallas" else ell
        out = jnp.zeros((self.n_pad, ell_pad), dtype=jnp.float32)
        return out.at[:n, :ell].set(jnp.asarray(b, jnp.float32))

    def _strip_gram(self, g, m, iv, b):
        if self.mode == "pallas":
            return pk.fused_gram_apply(
                g, m, iv, b, tile_d=self.tile_d,
                precision=self.kernel_precision,
            )
        return _xla_strip_gram(g, m, iv, b)

    def _strip_right(self, g, m, iv, b):
        if self.mode == "pallas":
            return pk.fused_right_apply(
                g, m, iv, b, tile_d=self.tile_d,
                precision=self.kernel_precision,
            )
        return _xla_strip_right(g, m, iv, b)

    # ---- public passes ----------------------------------------------
    def gram_apply(self, b: jax.Array) -> jax.Array:
        ell = b.shape[1]
        bp = self._pad_b(b)
        acc = jnp.zeros((self.n_pad, bp.shape[1]), dtype=jnp.float32)
        for g, m, iv in self._prefetcher():
            acc = acc + self._strip_gram(g, m, iv, bp)
        return acc[: self.n_samples, :ell]

    def tsq_accumulate(self, b: jax.Array) -> jax.Array:
        ell = b.shape[1]
        bp = self._pad_b(b)
        acc = jnp.zeros((bp.shape[1], bp.shape[1]), dtype=jnp.float32)
        for g, m, iv in self._prefetcher():
            w = self._strip_right(g, m, iv, bp)
            acc = acc + jnp.dot(
                w.T, w, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        return acc[:ell, :ell]

    def right_apply(self, b: jax.Array) -> np.ndarray:
        ell = b.shape[1]
        bp = self._pad_b(b)
        outs = []
        rows_left = self.n_rows
        for g, m, iv in self._prefetcher():
            w = self._strip_right(g, m, iv, bp)
            take = min(rows_left, w.shape[0])
            outs.append(np.asarray(w)[:take, :ell])
            rows_left -= take
        return np.concatenate(outs, axis=0)

"""Host-streamed standardized matrix for bigger-than-HBM datasets.

Implements `ops.operator.StandardizedOperator` (see ops/operator.py for
the container role split) but the genotype strips
live on HOST (disk via BedReader, or RAM) and stream through the prefetch
pipeline (io/prefetch.py) each pass, double-buffered against device
compute.  This is the reference's lazy accessor + IoService combination
(/root/reference/src/prepare.rs:169-920, 1838-2029) re-shaped for TPU:
whole strips DMA to HBM ahead of use and run through the fused Pallas
kernels.

Strips can be int8 dosages or PLINK 2-bit packed bytes (`packed=True`):
the packed layout moves 4x less data per pass over the host->device
link — the bottleneck of this container by construction — and feeds the
packed kernel family (1-D row tiles, 2-D tiles for biobank-wide sample
axes, or the XLA unpack fallback), mirroring parallel/sharded.py's mode
selection and plane-major sample permutation.

Use when the resident matrix exceeds device HBM; otherwise prefer
ShardedMatrix (strips resident, no re-read per pass).
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


@jax.jit
def _xla_strip_gram_packed(g, m, iv, b):
    from genomic_pca_tpu.parallel.sharded import _unpack_planes_std

    a = _unpack_planes_std(g, m, iv)  # (S, 4*n4) plane-major
    w = jnp.dot(a, b, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    return jnp.dot(a.T, w, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


@jax.jit
def _xla_strip_right_packed(g, m, iv, b):
    from genomic_pca_tpu.parallel.sharded import _unpack_planes_std

    a = _unpack_planes_std(g, m, iv)
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


class StreamingMatrix:
    """Standardized genotype operator streamed from host per pass.

    `strip_source(i)` returns host arrays for strip i:
      dense  — (geno int8 (S, N), mean (S,), std (S,))
      packed — (PLINK bytes uint8 (S, ceil(N/4)), mean (S,), std (S,)),
               trailing-bit sanitized (`sanitize_partial_byte`).
    Every strip must have the same row count S = `strip_size` (sources
    pad the last strip; padded rows carry std = 0 and are inert).
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
        kernel_precision: str = "q8",
        prefetch_depth: int = 3,
        prefetch_workers: int = 4,
        packed: bool = False,
        devices=None,
        q8_polish: Optional[int] = None,
        missing_fraction: Optional[float] = None,
    ):
        from genomic_pca_tpu.parallel.sharded import (
            auto_tile_d, packed_cols, resolve_q8_polish,
        )

        # Multi-chip streaming: strips round-robin across the mesh's
        # local devices (strip i -> device i mod D), so HBM ingest
        # bandwidth, the host->device link, and the per-strip kernels
        # all scale with the device count.  Each device keeps its own
        # partial accumulator; the small condensed factors ((N, l) /
        # (l, l)) merge once per pass at the end — the streaming analog
        # of ShardedMatrix's variant-axis psum.
        self.devices = (
            list(devices) if devices is not None else jax.local_devices()
        )
        self._source = strip_source
        self.n_strips = n_strips
        self.n_rows = n_rows
        self.n_samples = n_samples
        self.strip_size = strip_size
        self.packed = packed
        if packed:
            self.n4_pad = packed_cols(n_samples)
            self.n_pad = 4 * self.n4_pad
        else:
            self.n4_pad = 0
            self.n_pad = _round_up(n_samples, 128)
        if mode is None:
            mode = "pallas" if jax.devices()[0].platform == "tpu" else "xla"
        if mode in ("pallas", "pallas_interpret"):
            fitted = auto_tile_d(
                self.n_pad, requested=tile_d, precision=kernel_precision
            )
            if fitted == 0:
                # Sample axis too wide for a full-row VMEM tile: 2-D
                # tiled kernels (dense AND packed variants exist).
                mode = "pallas2d" + ("_interpret" if "interpret" in mode else "")
            else:
                tile_d = fitted
        self.mode = mode
        pallas = mode.startswith("pallas")
        # Uploaded strips are row-padded to a tile_d multiple so the
        # kernel grid divides evenly (the reference's default strip size
        # is 2000 — not a power of two; tile_d always is).
        if pallas:
            tile_d = min(tile_d, _round_up(strip_size, 32))
            self.strip_rows = _round_up(strip_size, tile_d)
        else:
            self.strip_rows = strip_size
        self.tile_d = tile_d
        if mode.startswith("pallas2d"):
            if packed:
                cands = (512, 256, 128)
                width = self.n4_pad
            else:
                cands = (2048, 1024, 512, 256, 128)
                width = self.n_pad
            self.tile_n = next(c for c in cands if width % c == 0)
        else:
            self.tile_n = 0
        if packed:
            if mode.startswith("pallas2d"):
                self._perm = pk.plane_major_perm_tiled(self.n_pad, self.tile_n)
            else:
                self._perm = pk.plane_major_perm(self.n_pad)
            self._invp = np.argsort(self._perm)
        self.kernel_precision = kernel_precision
        self.q8_polish = resolve_q8_polish(q8_polish, missing_fraction)
        if kernel_precision == "q8" and self.mode.startswith("pallas"):
            log.info(
                "Streaming container: int8-MXU quantized steering passes "
                "active (mode=%s, packed=%s, polish=%d).",
                self.mode, packed, self.q8_polish,
            )
        self.prefetch_depth = prefetch_depth
        self.prefetch_workers = prefetch_workers
        self.last_telemetry = None

    # ------------------------------------------------------------------
    def _fetch(self, i: int):
        from genomic_pca_tpu.parallel.sharded import PACKED_MISSING_BYTE, inv_std_of

        g, m, s = self._source(i)
        m = np.asarray(m, dtype=np.float32)
        s = np.asarray(s, dtype=np.float32)
        inv = inv_std_of(s).astype(np.float32)
        if self.packed:
            g = np.asarray(g, dtype=np.uint8)
            if g.shape[1] < self.n4_pad:  # pad byte columns, all-missing
                pad = self.n4_pad - g.shape[1]
                g = np.pad(g, ((0, 0), (0, pad)),
                           constant_values=PACKED_MISSING_BYTE)
        else:
            g = np.asarray(g, dtype=np.int8)
            if g.shape[1] < self.n_pad:  # pad samples with missing
                pad = self.n_pad - g.shape[1]
                g = np.pad(g, ((0, 0), (0, pad)), constant_values=MISSING)
        if g.shape[0] < self.strip_rows:  # pad rows to the kernel grid
            pad = self.strip_rows - g.shape[0]
            fill = PACKED_MISSING_BYTE if self.packed else 0
            g = np.pad(g, ((0, pad), (0, 0)), constant_values=fill)
            m = np.pad(m, (0, pad))
            inv = np.pad(inv, (0, pad))  # inv_std = 0: inert rows
        # HOST payload only: the device upload happens on the CONSUMER
        # (main) thread in `_prefetcher` — uploads issued from worker
        # threads are never freed on relayed backends, which at biobank
        # scale leaks a full matrix pass into device memory.
        return (g, m.reshape(-1, 1), inv.reshape(-1, 1)), g.nbytes

    def _prefetcher(self):
        p = StripPrefetcher(
            self._fetch,
            self.n_strips,
            depth=self.prefetch_depth,
            max_workers=self.prefetch_workers,
        )
        self.last_telemetry = p.telemetry

        def _uploaded():
            # try/finally so an abandoned pass (exception or early break
            # in the consumer) deterministically stops the workers
            # instead of relying on GC to close the generator chain.
            try:
                for i, (g, m, inv) in enumerate(p):
                    dev = self.devices[i % len(self.devices)]
                    # device_put enqueues asynchronously: strip i+1's
                    # wire transfer overlaps strip i's compute via the
                    # stream.
                    yield (
                        jax.device_put(g, dev),
                        jax.device_put(m, dev),
                        jax.device_put(inv, dev),
                    )
            finally:
                p.close()

        return _uploaded()

    def _pad_b(self, b: jax.Array) -> jax.Array:
        n, ell = b.shape
        pallas = self.mode.startswith("pallas")
        ell_pad = _round_up(ell, 128) if pallas else ell
        out = jnp.zeros((self.n_pad, ell_pad), dtype=jnp.float32)
        out = out.at[:n, :ell].set(jnp.asarray(b, jnp.float32))
        if self.packed:
            out = jnp.take(out, jnp.asarray(self._perm), axis=0)
        return out

    def _unperm(self, t: jax.Array) -> jax.Array:
        """Permuted sample rows -> original order (packed only)."""
        if self.packed:
            return jnp.take(t, jnp.asarray(self._invp), axis=0)
        return t

    @property
    def _exact_precision(self) -> str:
        """Precision for the exact kernel passes ("q8" steers only the
        power iterations; every other product runs bf16/f32)."""
        p = self.kernel_precision
        return "bf16" if p == "q8" else p

    def _strip_right(self, g, m, iv, b):
        interpret = self.mode.endswith("_interpret")
        precision = self._exact_precision
        if self.mode.startswith("pallas2d"):
            if self.packed:
                return pk.fused_right_apply_2d_packed(
                    g, m, iv, b, tile_d=self.tile_d, tile_n4=self.tile_n,
                    precision=precision, interpret=interpret,
                )
            return pk.fused_right_apply_2d(
                g, m, iv, b, tile_d=self.tile_d, tile_n=self.tile_n,
                precision=precision, interpret=interpret,
            )
        if self.mode.startswith("pallas"):
            fn = pk.fused_right_apply_packed if self.packed else pk.fused_right_apply
            return fn(
                g, m, iv, b, tile_d=self.tile_d,
                precision=precision, interpret=interpret,
            )
        if self.packed:
            return _xla_strip_right_packed(g, m, iv, b)
        return _xla_strip_right(g, m, iv, b)

    def _strip_gram(self, g, m, iv, b):
        interpret = self.mode.endswith("_interpret")
        precision = self._exact_precision
        if self.mode.startswith("pallas2d"):
            w = self._strip_right(g, m, iv, b)
            if self.packed:
                return pk.fused_left_apply_2d_packed(
                    g, m, iv, w, tile_d=self.tile_d, tile_n4=self.tile_n,
                    precision=precision, interpret=interpret,
                )
            return pk.fused_left_apply_2d(
                g, m, iv, w, tile_d=self.tile_d, tile_n=self.tile_n,
                precision=precision, interpret=interpret,
            )
        if self.mode.startswith("pallas"):
            fn = pk.fused_gram_apply_packed if self.packed else pk.fused_gram_apply
            return fn(
                g, m, iv, b, tile_d=self.tile_d,
                precision=precision, interpret=interpret,
            )
        if self.packed:
            return _xla_strip_gram_packed(g, m, iv, b)
        return _xla_strip_gram(g, m, iv, b)

    def _strip_gram_q8(self, g, m, iv, bq, sb, csum):
        """One quantized power pass over a strip: per-strip partial of
        T = A^T A b with the rank-1 term already folded (linear, so the
        fold commutes with the strip sum).  int8-MXU matmuls; same
        quantization model as the sharded container."""
        from genomic_pca_tpu.parallel.sharded import (
            _q8_packed_tile_d, _q8_packed_tile_d_2d,
        )

        interpret = self.mode.endswith("_interpret")
        u = m * iv
        if self.mode.startswith("pallas2d"):
            # q8 steering tile decoupled from the shared bf16 sizing
            # (packed planes are int8 — a 2-4x larger row tile fits
            # VMEM and cuts grid steps; strips cap it at strip_rows).
            t = (
                _q8_packed_tile_d_2d(
                    g.shape[0], self.tile_n, bq.shape[1], self.tile_d
                )
                if self.packed
                else self.tile_d
            )
            o, ru = pk.q8_power_pass_2d(
                g, iv, u, bq, sb, csum, tile_d=t,
                tile_n=self.tile_n, interpret=interpret,
            )
        elif self.packed:
            t = _q8_packed_tile_d(
                g.shape[0], g.shape[1], bq.shape[1], self.tile_d
            )
            o, ru = pk.fused_gram_q8_packed(
                g, iv, u, bq, sb, csum, tile_d=t, interpret=interpret,
            )
        else:
            o, ru = pk.fused_gram_q8(
                g, iv, u, bq, sb, csum, tile_d=self.tile_d,
                interpret=interpret,
            )
        return o - ru

    # ---- multi-device accumulation helpers ---------------------------
    def _replicate_b(self, bp: jax.Array):
        """Replicate the padded sketch onto every streaming device."""
        return [jax.device_put(bp, d) for d in self.devices]

    def _combine(self, accs: dict) -> jax.Array:
        """Merge per-device partial accumulators (one small transfer per
        extra device — the streaming analog of the psum over "v")."""
        dev0 = self.devices[0]
        total = None
        for d in self.devices:
            if d not in accs:
                continue
            part = accs[d] if d is dev0 else jax.device_put(accs[d], dev0)
            total = part if total is None else total + part
        return total

    # ---- public passes ----------------------------------------------
    def gram_apply(self, b: jax.Array) -> jax.Array:
        ell = b.shape[1]
        bp = self._pad_b(b)
        bps = self._replicate_b(bp)
        accs: dict = {}
        for i, (g, m, iv) in enumerate(self._prefetcher()):
            d = self.devices[i % len(self.devices)]
            part = self._strip_gram(g, m, iv, bps[i % len(self.devices)])
            accs[d] = part if d not in accs else accs[d] + part
        acc = self._combine(accs)
        return self._unperm(acc)[: self.n_samples, :ell]

    @staticmethod
    def _quantize_basis(bp: jax.Array):
        """Canonical basis quantization (ops/rsvd.quantize_basis —
        shared with the resident container's steering pass)."""
        from genomic_pca_tpu.ops.rsvd import quantize_basis

        return quantize_basis(bp)

    def _gram_apply_q8(self, b: jax.Array) -> jax.Array:
        """Quantized steering pass: A^T A b with int8-MXU matmuls per
        strip.  Used only inside `power_iterate`; user-visible products
        always run the exact kernels."""
        ell = b.shape[1]
        bq, sb, csum = self._quantize_basis(self._pad_b(b))
        parts = [
            tuple(jax.device_put(x, d) for x in (bq, sb, csum))
            for d in self.devices
        ]
        accs: dict = {}
        for i, (g, m, iv) in enumerate(self._prefetcher()):
            di = i % len(self.devices)
            d = self.devices[di]
            part = self._strip_gram_q8(g, m, iv, *parts[di])
            accs[d] = part if d not in accs else accs[d] + part
        acc = self._combine(accs)
        return self._unperm(acc)[: self.n_samples, :ell]

    def power_iterate(
        self,
        b0: jax.Array,
        n_iter: int,
        tolerance: Optional[float] = None,
    ) -> jax.Array:
        """n_iter x (B <- qr(A^T A B)), one full streaming pass each:
        (n_samples, l) orthonormal basis.  With kernel_precision="q8"
        the first n_iter - q8_polish passes run the int8-MXU kernels
        (2x the bf16 MXU rate at 1/1 HBM traffic — the strips re-read
        either way) and the final `q8_polish` passes run exact, the
        same polish discipline as ShardedMatrix.power_iterate.  With
        `tolerance` the STEERING passes early-exit on the relative
        subspace residual (exact polish always runs) and the return is
        (basis, n_iterations_done)."""
        b = jnp.asarray(b0, jnp.float32)
        use_q8 = (
            self.kernel_precision == "q8"
            and self.mode.startswith("pallas")
        )
        n_q8 = max(n_iter - self.q8_polish, 0) if use_q8 else 0
        n_done = 0
        converged = False
        for t in range(n_iter):
            is_polish = use_q8 and t >= n_q8
            if converged and not is_polish:
                continue
            tmat = self._gram_apply_q8(b) if t < n_q8 else self.gram_apply(b)
            res = None
            if tolerance is not None and t > 0 and not converged:
                from genomic_pca_tpu.ops.rsvd import subspace_residual

                res = float(subspace_residual(b, tmat))
            b, _ = jnp.linalg.qr(tmat)
            n_done += 1
            if res is not None and res < tolerance:
                if not use_q8:
                    break
                converged = True  # skip remaining steering; polish runs
        if tolerance is None:
            return b
        return b, n_done

    def tsq_accumulate(self, b: jax.Array) -> jax.Array:
        ell = b.shape[1]
        bp = self._pad_b(b)
        bps = self._replicate_b(bp)
        accs: dict = {}
        for i, (g, m, iv) in enumerate(self._prefetcher()):
            d = self.devices[i % len(self.devices)]
            w = self._strip_right(g, m, iv, bps[i % len(self.devices)])
            part = jnp.dot(
                w.T, w, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            accs[d] = part if d not in accs else accs[d] + part
        acc = self._combine(accs)
        return acc[:ell, :ell]

    def right_apply(self, b: jax.Array) -> np.ndarray:
        ell = b.shape[1]
        bp = self._pad_b(b)
        bps = self._replicate_b(bp)
        outs = []
        for i, (g, m, iv) in enumerate(self._prefetcher()):
            w = self._strip_right(g, m, iv, bps[i % len(self.devices)])
            # real (unpadded) rows of strip i — strips may be row-padded
            # past strip_size to the kernel-grid multiple.  Slice rows
            # AND the padded sketch columns on device: fetching the full
            # 128-lane pad through a slow host link costs ell_pad/ell x
            # the necessary bytes.
            real = min(self.strip_size, self.n_rows - i * self.strip_size)
            outs.append(np.asarray(w[:real, :ell]))
        return np.concatenate(outs, axis=0)

    # Device-side A B capture budget: per-strip products kept in HBM
    # total n_strips x strip_rows x ell_pad x 4 bytes.  Conservative;
    # past it the host-capture path below applies.
    _CAPTURE_DEVICE_BUDGET = 6 << 30

    def tsq_and_project(self, b: jax.Array):
        """One fused streaming pass returning `tsq_accumulate(b)`
        ((l, l) device) and a `project(w_k) -> (n_rows, k) float32 host`
        closure.

        Improvement over `tsq_and_capture` for asymmetric links: the
        per-strip `A_s B` products STAY ON THEIR DEVICE, and `project`
        contracts each with the (l, k) eigenvector block there before
        downloading — device-to-host moves (n_rows, k) instead of
        (n_rows, l).  At l = 128 lane-filled refinement width and
        k = 40 that is 3.2x fewer D2H bytes (the loadings floor), with
        zero cross-device traffic (each strip projects where it lives).
        Falls back to None (callers use `tsq_and_capture`) when the
        captured products would not fit the HBM budget.
        """
        ell = b.shape[1]
        ell_pad = _round_up(ell, 128) if self.mode.startswith("pallas") else ell
        cap_bytes = self.n_strips * self.strip_rows * ell_pad * 4
        if cap_bytes > self._CAPTURE_DEVICE_BUDGET:
            return None
        bp = self._pad_b(b)
        bps = self._replicate_b(bp)
        accs: dict = {}
        ws: list = []  # per-strip (strip_rows, ell_pad) device arrays
        for i, (g, m, iv) in enumerate(self._prefetcher()):
            d = self.devices[i % len(self.devices)]
            w = self._strip_right(g, m, iv, bps[i % len(self.devices)])
            part = jnp.dot(
                w.T, w, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            accs[d] = part if d not in accs else accs[d] + part
            ws.append(w)
        acc = self._combine(accs)

        def project(w_small: np.ndarray) -> np.ndarray:
            w_small = np.asarray(w_small, dtype=np.float32)
            pads = [
                jax.device_put(
                    np.pad(w_small, ((0, ell_pad - w_small.shape[0]), (0, 0))),
                    d,
                )
                for d in self.devices
            ]
            outs = []
            for i, w in enumerate(ws):
                p = pads[i % len(self.devices)]
                real = min(
                    self.strip_size, self.n_rows - i * self.strip_size
                )
                outs.append(
                    np.asarray(
                        jnp.dot(
                            w[:real], p,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST,
                        )
                    )
                )
            ws.clear()  # release the captured products
            return np.concatenate(outs, axis=0)

        return acc[:ell, :ell], project

    def tsq_and_capture(self, b: jax.Array):
        """One fused streaming pass returning BOTH
        `tsq_accumulate(b)` ((l, l) device) and `A B` ((n_rows, l) host).

        PCA finalization needs the condensed Gram of the final basis AND
        the loadings `A V / sigma`; since `V = B W`,
        `A V = (A B) W` — so capturing the per-strip `A_s B` products the
        tsq already computes saves one full pass over the data (each
        streaming pass re-reads and re-uploads the whole matrix).
        Callers finish with a host-side `(A B) @ W` (models use it via
        the `tsq_and_capture` duck-type check).  Host memory cost:
        n_rows x l f32.
        """
        ell = b.shape[1]
        bp = self._pad_b(b)
        bps = self._replicate_b(bp)
        accs: dict = {}
        outs = []
        for i, (g, m, iv) in enumerate(self._prefetcher()):
            d = self.devices[i % len(self.devices)]
            w = self._strip_right(g, m, iv, bps[i % len(self.devices)])
            part = jnp.dot(
                w.T, w, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            accs[d] = part if d not in accs else accs[d] + part
            real = min(self.strip_size, self.n_rows - i * self.strip_size)
            outs.append(np.asarray(w[:real, :ell]))
        acc = self._combine(accs)
        return acc[:ell, :ell], np.concatenate(outs, axis=0)

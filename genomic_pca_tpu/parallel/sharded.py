"""Variant-sharded streamed matrix: shard_map + Pallas + psum.

The production container for the standardized genotype operator A (D x N):

* Genotypes live as one 2-D int8 array (D_pad, N_pad) sharded over rows
  on a 1-D mesh ("v"); per-SNP mean / inv_std columns shard identically.
  Row padding carries inv_std = 0 (standardizes to zero); sample-column
  padding is the missing sentinel -127 (standardizes to zero); sketch
  columns pad with zeros.  All padding is mathematically inert.
* Each pass runs under `shard_map`: the local row block goes through a
  fused Pallas kernel (ops/pallas_kernels.py — int8 read straight into
  VMEM, standardize on the VPU, both MXU matmuls in-place) or, off-TPU,
  an XLA scan over strips; a single `psum` over "v" merges the small
  condensed factors.  Only (N x l)/(l x l) blocks ever cross ICI.
* On a 1-device mesh the same code is the optimized single-chip path.

This replaces the reference's rayon worker pools + flume channels
(src/main.rs:103-106, src/prepare.rs:169-920) per SURVEY §2.3's
equivalence table.
"""

from __future__ import annotations

import functools
import logging
from typing import Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from genomic_pca_tpu.ops import pallas_kernels as pk
from genomic_pca_tpu.ops.rsvd import (
    cholqr2_q, quantize_basis, subspace_residual,
)
from genomic_pca_tpu.ops.standardize import standardize_rows as _standardize
from genomic_pca_tpu.parallel.mesh import VARIANT_AXIS, make_mesh

log = logging.getLogger(__name__)

MISSING = -127


def resolve_q8_polish(
    q8_polish: Optional[int], missing_fraction: Optional[float]
) -> int:
    """Exact-iteration count finishing a quantized power loop.

    The q8 steering passes approximate each missing genotype as raw 0
    (a -u_i operator perturbation, ops/pallas_kernels.py q8 notes), so
    the polish budget scales with how much missingness QC could have
    admitted: <=2% (the default 0.98 call-rate gate) is validated at one
    polish pass (|r| >= 0.99999 vs float64, tests/test_q8.py); looser
    gates get a second exact pass (validated at 10% missing).  Explicit
    `q8_polish` overrides; unknown missingness takes the conservative
    default for the default QC gate.
    """
    if q8_polish is not None:
        if q8_polish < 1:
            raise ValueError("q8_polish must be >= 1 (the Rayleigh-Ritz "
                             "basis must come from an exact pass)")
        return int(q8_polish)
    if missing_fraction is not None and missing_fraction > 0.02:
        return 2
    return 1


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def inv_std_of(s: np.ndarray) -> np.ndarray:
    """1/std with the zero-std convention (0 -> standardize to zero).

    THE canonical expression for the framework's inert-row convention —
    every matrix-packing site must use it so the fused/re-read/streamed
    paths stay bit-identical.
    """
    s = np.asarray(s)
    return np.where(s > 0, 1.0 / np.where(s > 0, s, 1.0), 0.0)


# --- PLINK 2-bit packed layout helpers -------------------------------------
# Packed mode stores genotypes in PLINK's on-disk 2-bit encoding (uint8,
# 4 samples/byte, low bits first; count_A1 codes 00->2, 01->missing,
# 10->1, 11->0): 4x less HBM capacity and read bandwidth, and BED bytes
# upload verbatim.  See ops/pallas_kernels.py packed section for the
# plane-major sample permutation the fused kernels impose.

PACKED_MISSING_BYTE = 0x55  # four 01 (missing) fields


def packed_cols(n_samples: int) -> int:
    """Device column count for packed rows: ceil(n/4) bytes padded to the
    128-lane granularity.  THE canonical packed-width expression — the
    capture budget gates, batch padding, and resident-size estimate must
    all agree with the actual device layout."""
    return _round_up(max(-(-n_samples // 4), 1), 128)


@jax.jit
def pack_codes_device(g: jax.Array) -> jax.Array:
    """(D, N) int8 dosages WITHOUT missing values -> (D, N/4) PLINK
    uint8 ON DEVICE (count_A1 codes: 2 -> 00, 1 -> 10, 0 -> 11).

    Device-side re-encode for benchmarks/traces that synthesize data in
    HBM; production ingestion packs on the host (`pack_int8_rows`,
    which also handles the missing sentinel).  N must be a multiple
    of 4."""
    d, n = g.shape
    c = jnp.where(g == 2, 0, 3 - g.astype(jnp.int32)).astype(jnp.uint8)
    c4 = c.reshape(d, n // 4, 4)
    return (
        c4[..., 0] | (c4[..., 1] << 2) | (c4[..., 2] << 4) | (c4[..., 3] << 6)
    )


def pack_int8_rows(geno: np.ndarray) -> np.ndarray:
    """(D, N) int8 dosages -> (D, ceil(N/4)) PLINK-packed uint8.

    Pad fields (beyond N in the last byte) are 01 = missing (inert) —
    the on-disk encoder zero-fills them (PLINK convention), so sanitize
    afterwards."""
    from genomic_pca_tpu.io.bed import pack_bed_rows

    geno = np.asarray(geno)
    return sanitize_partial_byte(pack_bed_rows(geno), geno.shape[1])


def sanitize_partial_byte(
    packed: np.ndarray, n_samples: int
) -> np.ndarray:
    """Force trailing 2-bit fields of the last data byte to 01 (missing).

    PLINK zero-fills trailing bits, and code 00 means dosage 2 under
    count_A1 — NOT inert.  Call on raw BED bytes before device use."""
    rem = n_samples % 4
    if rem == 0 or packed.shape[1] == 0:
        return packed
    packed = packed.copy()
    keep = (1 << (2 * rem)) - 1
    fill = PACKED_MISSING_BYTE & (0xFF ^ keep)
    packed[:, -1] = (packed[:, -1] & keep) | fill
    return packed


def _unpack_planes_std(gg, m_col, iv_col):
    """(S, n4) uint8 packed -> (S, 4*n4) f32 standardized, PLANE-MAJOR
    sample order (XLA fallback analog of the packed Pallas kernels)."""
    c = gg.astype(jnp.int32)
    planes = []
    for p in range(4):
        cp = (c >> (2 * p)) & 3
        x = ((4 - cp) >> 1).astype(jnp.float32) * iv_col + (-m_col * iv_col)
        planes.append(jnp.where(cp != 1, x, 0.0))
    return jnp.concatenate(planes, axis=1)


def _dot(a, b):
    return jnp.dot(
        a, b, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _default_mode() -> str:
    return "pallas" if jax.devices()[0].platform == "tpu" else "xla"


# VMEM budget for kernel working sets.  The 15.5 MiB floor is
# calibrated against measured v5e limits: bf16 mode fits tile_d=1024 at
# N=2048 but tile_d=2048 fails to compile; f32 mode fits tile_d=512 but
# not 1024 (scripts/tune_kernels.py).  v4/v5-generation cores carry
# ~16 MiB of VMEM (pallas guide); Trillium-class (v6e) doubles it, so
# the budget scales by device kind.  Unknown kinds keep the
# conservative floor — a smaller budget only shrinks tiles, it never
# breaks compilation.
_VMEM_FLOOR = int(15.5 * 1024 * 1024)


@functools.lru_cache(maxsize=1)
def vmem_budget_bytes() -> int:
    """Per-core VMEM working-set budget derived from the device kind."""
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:  # backend not initialized / no devices
        return _VMEM_FLOOR
    if "v6" in kind or "trillium" in kind:
        return 2 * _VMEM_FLOOR
    return _VMEM_FLOOR


def auto_tile_d(
    n_pad: int,
    ell_pad: int = 128,
    requested: int = 1024,
    precision: str = "bf16",
) -> int:
    """Largest power-of-two row tile whose working set fits VMEM.

    Per grid step the gram kernel holds the int8 tile (x2 pipeline
    buffers) plus the standardize intermediates — bf16 mode is
    compare-free and never materializes an f32 copy (6 B/element);
    f32 mode does (10 B/element) — alongside B, its compute-dtype cast
    and the (n_pad, ell) f32 accumulator.  At biobank sample counts
    (n_pad ~ 500k) no row tile fits — callers fall back to the 2-D
    tiled kernels (return 0).
    """
    if precision == "q8":
        # int8 tile (x2 buffers) + the (tile_d, L) w/y/z/z8 intermediates
        # + the int8 basis and f32 accumulator.  The q8 power body still
        # builds the bf16 kernels for its polish/tsq/right passes, so
        # take the tighter (bf16) tile — both fit at the same size for
        # all practical (n_pad, ell) since the q8 working set is smaller.
        precision = "bf16"
    bf16 = precision != "f32"
    fixed = n_pad * ell_pad * (4 + (2 if bf16 else 4)) + n_pad * ell_pad * 4
    per_row = n_pad * ((2 * 1 + 2 + 2) if bf16 else (2 * 1 + 4 + 4))
    budget = vmem_budget_bytes()
    tile = min(requested, 2048)
    while tile >= 32:
        if fixed + tile * per_row <= budget:
            return tile
        tile //= 2
    return 0


# Default kernel precision of every container constructor; prepare.py's
# capture-assembly paths read it so their padding granule can never
# drift from the constructors' (raw-geno bit-identity across paths).
DEFAULT_KERNEL_PRECISION = "q8"


def _row_pad_tile(tile_d: int, kernel_precision: str, packed: bool) -> int:
    """Row-padding granule for the sharded layout: PACKED q8 containers
    pad to 2*tile_d so every shard stays divisible by the doubled q8
    steering tile (_q8_packed_tile_d) regardless of the survivor count
    — at most tile_d extra inert rows (~0.5 MB packed), bought back
    many times over by the larger tile's rate.  Dense containers keep
    the base granule: only the packed kernels take the doubled tile, so
    dense doubling would add padding (and shift row distribution across
    devices) for zero benefit."""
    return tile_d * (2 if (packed and kernel_precision == "q8") else 1)


def _grow_pow2_tile(d: int, base: int, cap: int, step_bytes) -> int:
    """Shared doubling loop of the q8 tile choosers: the largest
    power-of-two multiple of `base` that divides `d`, fits the VMEM
    budget per `step_bytes(t)`, and does not exceed `cap`."""
    budget = vmem_budget_bytes()
    tile = base
    t = base * 2
    while t <= cap and d % t == 0:
        if step_bytes(t) > budget:
            break
        tile = t
        t *= 2
    return tile


def _q8_packed_tile_d(d_shard: int, n4: int, ell: int, base: int) -> int:
    """Row tile for the 1-D packed q8 kernel: the largest power-of-two
    multiple of `base` (the bf16 kernels' tile) that divides the shard
    and fits VMEM, capped at 2048.

    The q8 kernel's working set is SMALLER than bf16's at equal tile
    (int8 planes, no f32 tile copy), so it can take a 2x-larger tile
    than the shared bf16 sizing: fewer grid steps halve the per-step
    (4*n4, ell) f32 accumulator traffic — measured 1.34 -> 1.27
    ms/call at the bench shape (VALIDATION.md round 5).  Working set
    per step: packed tile x2 pipeline buffers (2*t*n4) + unpacked
    planes (4*t*n4) + w/y/z f32 and z8 (13*t*ell) + bq and the
    double-buffered f32 accumulator (36*n4*ell)."""
    return _grow_pow2_tile(
        d_shard, base, 2048,
        lambda t: 6 * t * n4 + 13 * t * ell + 36 * n4 * ell,
    )


def _q8_packed_tile_d_2d(d: int, tn4: int, ell: int, base: int) -> int:
    """Row tile for the 2-D packed q8 kernels (right/left split): the
    largest power-of-two multiple of `base` dividing the row count that
    fits VMEM, capped at 4096.  The 2-D q8 kernels run the
    standardization corrections in XLA between the two calls
    (q8_power_pass_2d), so their in-kernel working set is the byte tile
    (x2 pipeline buffers) + unpacked planes (6*t*tn4), the (t, L) w/z8
    tiles (4*t*ell), and the larger of the two kernels' basis /
    accumulator blocks — the LEFT kernel's (4*tn4, L) f32 accumulator
    plus its int32 dot temp (32*tn4*ell) — measured: (4096, 512)
    compiles and is 8% faster than (1024, 512); (2048, 2048-bytes)
    correctly exceeds scoped VMEM.  The byte constants are calibrated
    at the production ell = 128 only (models/pca.lane_fill_width), so
    wider sketches keep the base tile rather than trusting the formula
    outside its measured envelope."""
    if ell > 128:
        return base
    return _grow_pow2_tile(
        d, base, 4096,
        lambda t: 5 * t * tn4 + 4 * t * ell + 32 * tn4 * ell,
    )


def _slice_blocks_impl(
    geno: jax.Array,  # (D_pad, N_pad) int8
    mean: jax.Array,  # (D_pad, 1) f32
    inv_std: jax.Array,  # (D_pad, 1) f32
    starts: jax.Array,  # (B,) int32 global row starts
    lens: jax.Array,  # (B,) int32 block lengths (<= bucket)
    col_idx,  # (C,) int32 sample columns, or None for all columns
    bucket: int,
) -> jax.Array:
    """(B, bucket, C) f32 standardized row-run blocks, sliced on device.

    Rows outside [start, start+len) and missing genotypes standardize to
    zero (inert padding, same convention as the host accessor).
    Un-jitted core shared by the standalone slicer and the fused
    stage-1+2 program (models/eigensnp.py).
    """
    d_pad = geno.shape[0]

    def one(start, d_b):
        astart = jnp.minimum(start, d_pad - bucket)
        g = jax.lax.dynamic_slice_in_dim(geno, astart, bucket, 0)
        m = jax.lax.dynamic_slice_in_dim(mean, astart, bucket, 0)
        iv = jax.lax.dynamic_slice_in_dim(inv_std, astart, bucket, 0)
        if col_idx is not None:
            g = jnp.take(g, col_idx, axis=1)
        rows = astart + jnp.arange(bucket, dtype=starts.dtype)
        rmask = (rows >= start) & (rows < start + d_b)
        gf = g.astype(jnp.float32)
        x = gf * iv + (-m * iv)
        x = jnp.where(gf == float(MISSING), 0.0, x)
        return jnp.where(rmask[:, None], x, 0.0)

    return jax.vmap(one)(starts, lens)


_slice_blocks_standardized = functools.partial(
    jax.jit, static_argnames=("bucket",)
)(_slice_blocks_impl)


def _slice_blocks_packed_impl(
    geno: jax.Array,  # (D_pad, N4_pad) uint8 packed
    mean: jax.Array,
    inv_std: jax.Array,
    starts: jax.Array,
    lens: jax.Array,
    col_idx,
    bucket: int,
) -> jax.Array:
    """Packed analog of `_slice_blocks_impl`: unpacks the sliced
    rows in plain XLA (interleave reshape restores ORIGINAL sample
    order — the Mosaic lane constraint does not apply outside Pallas)."""
    d_pad, n4 = geno.shape

    def one(start, d_b):
        astart = jnp.minimum(start, d_pad - bucket)
        gp = jax.lax.dynamic_slice_in_dim(geno, astart, bucket, 0)
        m = jax.lax.dynamic_slice_in_dim(mean, astart, bucket, 0)
        iv = jax.lax.dynamic_slice_in_dim(inv_std, astart, bucket, 0)
        c = gp.astype(jnp.int32)
        cs = jnp.stack(
            [(c >> (2 * p)) & 3 for p in range(4)], axis=-1
        ).reshape(bucket, 4 * n4)  # original sample order
        x = ((4 - cs) >> 1).astype(jnp.float32) * iv + (-m * iv)
        x = jnp.where(cs != 1, x, 0.0)
        if col_idx is not None:
            x = jnp.take(x, col_idx, axis=1)
        rows = astart + jnp.arange(bucket, dtype=starts.dtype)
        rmask = (rows >= start) & (rows < start + d_b)
        return jnp.where(rmask[:, None], x, 0.0)

    return jax.vmap(one)(starts, lens)


_slice_blocks_standardized_packed = functools.partial(
    jax.jit, static_argnames=("bucket",)
)(_slice_blocks_packed_impl)


class ShardedMatrix:
    """Standardized genotype operator sharded over the variant axis.

    Implements `ops.operator.StandardizedOperator` (n_samples, n_rows,
    gram_apply, tsq_accumulate, right_apply) plus every optional fast
    path (power_iterate, pca_core) — the production HBM-resident
    container; see ops/operator.py for the container role split.
    """

    def __init__(
        self,
        geno: jax.Array,  # (D_pad, N_pad) int8, P(v, None)
        mean: jax.Array,  # (D_pad, 1) f32, P(v, None)
        inv_std: jax.Array,  # (D_pad, 1) f32, P(v, None)
        n_rows: int,
        n_samples: int,
        mesh: Mesh,
        mode: Optional[str] = None,
        tile_d: int = 1024,
        kernel_precision: str = "q8",
        row_segments: Optional[np.ndarray] = None,
        q8_polish: Optional[int] = None,
        missing_fraction: Optional[float] = None,
    ):
        self.geno = geno
        self.mean = mean
        self.inv_std = inv_std
        self.n_rows = n_rows
        self.n_samples = n_samples
        self.mesh = mesh
        self.q8_polish = resolve_q8_polish(q8_polish, missing_fraction)
        # Segmented row layout (multi-process fused assembly): (S, 3)
        # rows of (matrix_row_start, pca_row_start, count) — real rows
        # live in per-process segments with inert padding between them
        # instead of one prefix run.  None = prefix layout (rows
        # [0, n_rows) are the real rows, padding at the end).
        if row_segments is not None:
            row_segments = np.asarray(row_segments, dtype=np.int64)
            assert row_segments.ndim == 2 and row_segments.shape[1] == 3
            assert int(row_segments[:, 2].sum()) == n_rows
        self.row_segments = row_segments
        self.mode = mode or _default_mode()
        self.kernel_precision = kernel_precision
        # uint8 genotypes signal the PLINK 2-bit packed layout: the
        # sample axis is 4x the byte axis, and sample-indexed vectors
        # ride in the kernels' plane-major permutation.
        self.packed = geno.dtype == jnp.uint8
        self.d_pad = geno.shape[0]
        self.n_pad = geno.shape[1] * 4 if self.packed else geno.shape[1]
        if self.mode == "pallas":
            fitted = auto_tile_d(
                self.n_pad, requested=tile_d, precision=kernel_precision
            )
            if fitted == 0:
                # Sample axis too wide for a full-row VMEM tile: switch
                # to the 2-D tiled kernels (both axes blocked, small
                # (D, L) intermediate in HBM).
                self.mode = "pallas2d"
            elif fitted != tile_d:
                tile_d = fitted
        self.tile_d = tile_d
        self.tile_n = self._pick_tile_n()
        if self.packed:
            # Sample-indexed vectors ride in the kernels' plane-major
            # permutation: tile-local for the 2-D kernels (one byte tile
            # of tile_n unpacks per grid step), global otherwise (the
            # 1-D kernels and the XLA scan unpack full-width rows).
            if self.mode.startswith("pallas2d"):
                self._perm = pk.plane_major_perm_tiled(self.n_pad, self.tile_n)
            else:
                self._perm = pk.plane_major_perm(self.n_pad)
            self._invp = np.argsort(self._perm)
        if kernel_precision == "q8" and self.mode.startswith("pallas"):
            log.info(
                "int8-MXU quantized power path active (mode=%s, packed=%s,"
                " polish=%d exact pass%s; missing genotypes approximate to"
                " raw 0 during steering iterations only).",
                self.mode, self.packed, self.q8_polish,
                "" if self.q8_polish == 1 else "es",
            )
        self._build_kernels()

    def _pick_tile_n(self) -> int:
        """Sample-axis tile for the 2-D kernels: the largest 128-multiple
        divisor of the stored column count <= 2048 (dense) / 512 bytes
        (packed — same 2048-sample unpacked footprint)."""
        if self.packed:
            n4 = self.geno.shape[1]
            for cand in (512, 256, 128):
                if n4 % cand == 0:
                    return cand
            return 128  # unreachable: packed_cols pads to 128 lanes
        for cand in (2048, 1024, 512, 256, 128):
            if self.n_pad % cand == 0:
                return cand
        return 128

    # ------------------------------------------------------------------
    @staticmethod
    def from_arrays(
        geno_strips: Iterator[np.ndarray],
        means: Optional[List[np.ndarray]] = None,
        stds: Optional[List[np.ndarray]] = None,
        strip_size: int = 2048,
        center_only: bool = False,
        mesh: Optional[Mesh] = None,
        mode: Optional[str] = None,
        tile_d: int = 1024,
        kernel_precision: str = "q8",
        q8_polish: Optional[int] = None,
        missing_fraction: Optional[float] = None,
    ) -> "ShardedMatrix":
        """Pack host int8 strips into the padded sharded 2-D layout.

        Moments are computed exactly from integer histograms when not
        supplied; `center_only=True` sets inv_std to 1 (VCF-mode
        center-without-scale, matching tests/pca.py:109).  `strip_size`
        is accepted for API compatibility (the XLA fallback scans in
        `tile_d` strips).
        """
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
                # Host-side exact integer histograms (avoids a fresh
                # device compile per distinct strip shape at pack time).
                n1 = (g == 1).sum(axis=1, dtype=np.int64)
                n2 = (g == 2).sum(axis=1, dtype=np.int64)
                nv = n1 + n2 + (g == 0).sum(axis=1, dtype=np.int64)
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
        m_all = np.concatenate(ms, axis=0).astype(np.float32)
        s_all = np.concatenate(ss, axis=0).astype(np.float32)
        n_rows = g_all.shape[0]

        d_pad = _round_up(
            max(n_rows, 1),
            _row_pad_tile(tile_d, kernel_precision, packed=False) * n_dev,
        )
        n_pad = _round_up(n_samples, 128)
        g_pad = np.full((d_pad, n_pad), MISSING, dtype=np.int8)
        g_pad[:n_rows, :n_samples] = g_all
        m_pad = np.zeros((d_pad, 1), dtype=np.float32)
        m_pad[:n_rows, 0] = m_all
        inv_pad = np.zeros((d_pad, 1), dtype=np.float32)
        inv_pad[:n_rows, 0] = inv_std_of(s_all)

        sh = NamedSharding(mesh, P(VARIANT_AXIS, None))
        return ShardedMatrix(
            geno=jax.device_put(g_pad, sh),
            mean=jax.device_put(m_pad, sh),
            inv_std=jax.device_put(inv_pad, sh),
            n_rows=n_rows,
            n_samples=n_samples,
            mesh=mesh,
            mode=mode,
            tile_d=tile_d,
            kernel_precision=kernel_precision,
            q8_polish=q8_polish,
            missing_fraction=missing_fraction,
        )

    # ------------------------------------------------------------------
    @staticmethod
    def from_local_rows(
        read_rows,  # Callable[[int, int], (geno, mean, std)] for global rows [lo, hi)
        n_rows: int,
        n_samples: int,
        mesh: Optional[Mesh] = None,
        mode: Optional[str] = None,
        tile_d: int = 1024,
        kernel_precision: str = "q8",
        q8_polish: Optional[int] = None,
        missing_fraction: Optional[float] = None,
        center_only: bool = False,
        packed: bool = False,
    ) -> "ShardedMatrix":
        """Multi-host constructor: each PROCESS reads only the global row
        range its devices own (per-host BED byte-range reads, SURVEY §5
        long-context mapping), and the global sharded array assembles via
        `jax.make_array_from_process_local_data` — genotypes never
        transit through a single host.

        `read_rows(lo, hi)` returns host arrays for global SNP rows
        [lo, hi) clipped to n_rows: geno (hi-lo', N) int8 dosages — or,
        with `packed=True`, (hi-lo', ceil(N/4)) raw PLINK uint8 bytes
        (sanitized here; 4x less upload per host) — plus mean (hi-lo',)
        and std (hi-lo',).  Works unchanged single-process.
        """
        mesh = mesh or make_mesh()
        n_dev = mesh.devices.size
        d_pad = _round_up(
            max(n_rows, 1),
            _row_pad_tile(tile_d, kernel_precision, packed) * n_dev,
        )
        n_pad = packed_cols(n_samples) if packed else _round_up(n_samples, 128)
        rows_per_dev = d_pad // n_dev

        proc = jax.process_index()
        flat = list(mesh.devices.flat)
        local_dev_idx = [i for i, d in enumerate(flat) if d.process_index == proc]
        if not local_dev_idx:
            raise ValueError("This process owns no devices in the mesh.")
        lo = min(local_dev_idx) * rows_per_dev
        hi = (max(local_dev_idx) + 1) * rows_per_dev

        geno_dtype = np.uint8 if packed else np.int8
        read_hi = min(hi, n_rows)
        if lo < read_hi:
            g, m, s = read_rows(lo, read_hi)
            g = np.asarray(g, dtype=geno_dtype)
            if packed:
                g = sanitize_partial_byte(g, n_samples)
            m = np.asarray(m, dtype=np.float32)
            s = np.asarray(s, dtype=np.float32)
        else:
            g = np.zeros((0, (n_samples + 3) // 4 if packed else n_samples), geno_dtype)
            m = np.zeros(0, dtype=np.float32)
            s = np.zeros(0, dtype=np.float32)
        if center_only:
            s = np.ones_like(m)

        local_rows = hi - lo
        g_loc = np.full(
            (local_rows, n_pad),
            PACKED_MISSING_BYTE if packed else MISSING,
            dtype=geno_dtype,
        )
        g_loc[: g.shape[0], : g.shape[1]] = g
        m_loc = np.zeros((local_rows, 1), dtype=np.float32)
        m_loc[: len(m), 0] = m
        inv_loc = np.zeros((local_rows, 1), dtype=np.float32)
        inv_loc[: len(s), 0] = inv_std_of(s)

        sh = NamedSharding(mesh, P(VARIANT_AXIS, None))
        if jax.process_count() == 1:
            geno = jax.device_put(g_loc, sh)
            mean = jax.device_put(m_loc, sh)
            inv = jax.device_put(inv_loc, sh)
        else:
            geno = jax.make_array_from_process_local_data(sh, g_loc, (d_pad, n_pad))
            mean = jax.make_array_from_process_local_data(sh, m_loc, (d_pad, 1))
            inv = jax.make_array_from_process_local_data(sh, inv_loc, (d_pad, 1))
        return ShardedMatrix(
            geno=geno,
            mean=mean,
            inv_std=inv,
            n_rows=n_rows,
            n_samples=n_samples,
            mesh=mesh,
            mode=mode,
            tile_d=tile_d,
            kernel_precision=kernel_precision,
            q8_polish=q8_polish,
            missing_fraction=missing_fraction,
        )

    # ------------------------------------------------------------------
    @staticmethod
    def from_owned_units(
        unit_counts: np.ndarray,  # (U,) global row count per unit
        unit_owner: np.ndarray,  # (U,) owning process index per unit
        local_units,  # {unit_index: (geno, mean, std)} for units THIS process owns
        n_samples: int,
        mesh: Optional[Mesh] = None,
        mode: Optional[str] = None,
        tile_d: int = 1024,
        kernel_precision: str = "q8",
        q8_polish: Optional[int] = None,
        missing_fraction: Optional[float] = None,
        packed: bool = False,
        center_only: bool = False,
    ) -> "ShardedMatrix":
        """Multi-host constructor for UNIT-sharded ingestion (per-host VCF
        file sharding: each process parses only the files it owns —
        SURVEY §2.3 row 1, the `rayon par_iter` over files of
        /root/reference/src/main.rs:171-179 made distributed).

        `unit_counts`/`unit_owner` are GLOBAL knowledge (identical on
        every process): row count and owning process of each unit (e.g.
        VCF file), in global unit order.  Global PcaSnpId order is unit
        order (reference file-order aggregation, vcf.rs:293-315); each
        unit becomes one row segment placed inside its owner's device
        shard, so genotypes never leave the process that parsed them.
        With `packed=True` unit genotypes are raw 2-bit rows (sanitized
        here).  Works unchanged single-process.
        """
        mesh = mesh or make_mesh()
        unit_counts = np.asarray(unit_counts, dtype=np.int64)
        unit_owner = np.asarray(unit_owner, dtype=np.int64)
        n_units = len(unit_counts)
        n_rows = int(unit_counts.sum())
        proc = jax.process_index()
        n_proc = jax.process_count()

        # Device ranges per process (canonical contiguous layout).
        flat = list(mesh.devices.flat)
        dev_idx_of = {p: [] for p in range(n_proc)}
        for i, d in enumerate(flat):
            dev_idx_of.setdefault(d.process_index, []).append(i)
        ndev_of = {}
        lo_dev_of = {}
        for p, idxs in dev_idx_of.items():
            if not idxs:
                continue
            if max(idxs) - min(idxs) + 1 != len(idxs):
                raise ValueError(
                    "from_owned_units requires each process's devices to "
                    "be contiguous in mesh order"
                )
            ndev_of[p] = len(idxs)
            lo_dev_of[p] = min(idxs)

        # Per-process totals -> uniform rows_per_dev (tile_d-aligned).
        totals = np.zeros(max(n_proc, int(unit_owner.max(initial=0)) + 1),
                         dtype=np.int64)
        for u in range(n_units):
            totals[unit_owner[u]] += unit_counts[u]
        rows_per_dev = 1
        for p, nd in ndev_of.items():
            need = -(-int(totals[p]) // nd)
            rows_per_dev = max(rows_per_dev, need)
        rows_per_dev = _round_up(
            rows_per_dev, _row_pad_tile(tile_d, kernel_precision, packed)
        )
        d_pad = rows_per_dev * len(flat)
        n_pad = packed_cols(n_samples) if packed else _round_up(n_samples, 128)

        # Global segment table (computed identically on every process):
        # units in global order, placed consecutively inside their
        # owner's row range.
        pca_ofs = np.concatenate([[0], np.cumsum(unit_counts)])
        local_cursor = {p: 0 for p in ndev_of}
        segments = []
        placement = {}  # unit -> matrix_row_start
        for u in range(n_units):
            cnt = int(unit_counts[u])
            if cnt == 0:
                continue
            p = int(unit_owner[u])
            if p not in ndev_of:
                raise ValueError(f"unit {u} owned by process {p} with no devices")
            mstart = lo_dev_of[p] * rows_per_dev + local_cursor[p]
            local_cursor[p] += cnt
            placement[u] = mstart
            segments.append((mstart, int(pca_ofs[u]), cnt))
        segments = np.asarray(
            sorted(segments, key=lambda s: s[1]), dtype=np.int64
        ).reshape(-1, 3)

        # Fill this process's local buffer.
        geno_dtype = np.uint8 if packed else np.int8
        my_lo = lo_dev_of[proc] * rows_per_dev
        my_rows = ndev_of[proc] * rows_per_dev
        g_loc = np.full(
            (my_rows, n_pad),
            PACKED_MISSING_BYTE if packed else MISSING,
            dtype=geno_dtype,
        )
        m_loc = np.zeros((my_rows, 1), dtype=np.float32)
        inv_loc = np.zeros((my_rows, 1), dtype=np.float32)
        for u, (g, m, s) in local_units.items():
            if int(unit_owner[u]) != proc:
                raise ValueError(f"process {proc} supplied unit {u} it does not own")
            g = np.asarray(g, dtype=geno_dtype)
            if packed:
                g = sanitize_partial_byte(g, n_samples)
            ofs = placement[u] - my_lo
            g_loc[ofs : ofs + g.shape[0], : g.shape[1]] = g
            m_loc[ofs : ofs + g.shape[0], 0] = np.asarray(m, dtype=np.float32)
            s_arr = (
                np.ones(g.shape[0], dtype=np.float32)
                if center_only
                else np.asarray(s, dtype=np.float32)
            )
            inv_loc[ofs : ofs + g.shape[0], 0] = inv_std_of(s_arr)

        sh = NamedSharding(mesh, P(VARIANT_AXIS, None))
        if n_proc == 1:
            geno = jax.device_put(g_loc, sh)
            mean = jax.device_put(m_loc, sh)
            inv = jax.device_put(inv_loc, sh)
        else:
            geno = jax.make_array_from_process_local_data(sh, g_loc, (d_pad, n_pad))
            mean = jax.make_array_from_process_local_data(sh, m_loc, (d_pad, 1))
            inv = jax.make_array_from_process_local_data(sh, inv_loc, (d_pad, 1))
        return ShardedMatrix(
            geno=geno,
            mean=mean,
            inv_std=inv,
            n_rows=n_rows,
            n_samples=n_samples,
            mesh=mesh,
            mode=mode,
            tile_d=tile_d,
            kernel_precision=kernel_precision,
            q8_polish=q8_polish,
            missing_fraction=missing_fraction,
            row_segments=segments,
        )

    # ------------------------------------------------------------------
    @staticmethod
    def from_packed_rows(
        packed_rows: np.ndarray,  # (D, bytes_per_row) uint8 raw PLINK bytes
        mean: np.ndarray,  # (D,) f32
        std: np.ndarray,  # (D,) f32
        n_samples: int,
        mesh: Optional[Mesh] = None,
        mode: Optional[str] = None,
        tile_d: int = 1024,
        kernel_precision: str = "q8",
        q8_polish: Optional[int] = None,
        missing_fraction: Optional[float] = None,
    ) -> "ShardedMatrix":
        """Build the packed (2-bit) sharded matrix from raw PLINK bytes.

        The bytes upload VERBATIM (after trailing-bit sanitization) —
        no host decode, 4x less transfer and HBM than the int8 layout.
        Row padding is all-missing bytes with inv_std = 0; the sample
        byte axis pads to a 128-lane multiple with 0x55.
        """
        mesh = mesh or make_mesh()
        n_dev = mesh.devices.size
        packed_rows = np.asarray(packed_rows, dtype=np.uint8)
        packed_rows = sanitize_partial_byte(packed_rows, n_samples)
        d = packed_rows.shape[0]
        d_pad = _round_up(
            max(d, 1),
            _row_pad_tile(tile_d, kernel_precision, packed=True) * n_dev,
        )
        n4_pad = packed_cols(n_samples)
        g_pad = np.full((d_pad, n4_pad), PACKED_MISSING_BYTE, dtype=np.uint8)
        g_pad[:d, : packed_rows.shape[1]] = packed_rows
        m_pad = np.zeros((d_pad, 1), dtype=np.float32)
        m_pad[:d, 0] = np.asarray(mean, dtype=np.float32)
        inv_pad = np.zeros((d_pad, 1), dtype=np.float32)
        inv_pad[:d, 0] = inv_std_of(np.asarray(std, dtype=np.float32))

        sh = NamedSharding(mesh, P(VARIANT_AXIS, None))
        return ShardedMatrix(
            geno=jax.device_put(g_pad, sh),
            mean=jax.device_put(m_pad, sh),
            inv_std=jax.device_put(inv_pad, sh),
            n_rows=d,
            n_samples=n_samples,
            mesh=mesh,
            mode=mode,
            tile_d=tile_d,
            kernel_precision=kernel_precision,
            q8_polish=q8_polish,
            missing_fraction=missing_fraction,
        )

    # ------------------------------------------------------------------
    @staticmethod
    def from_packed_strips(
        read_strip,  # Callable[[int, int], np.ndarray] rows [lo, hi) -> (hi-lo, <=cols) uint8
        n_rows: int,
        mean: np.ndarray,
        std: np.ndarray,
        n_samples: int,
        mesh: Optional[Mesh] = None,
        mode: Optional[str] = None,
        tile_d: int = 1024,
        kernel_precision: str = "q8",
        q8_polish: Optional[int] = None,
        missing_fraction: Optional[float] = None,
        strip_rows: int = 262_144,
    ) -> "ShardedMatrix":
        """Packed constructor that streams strip-sized host buffers to
        the device(s) with ASYNC device_puts, then concatenates
        device-side into each device's (rows_per_dev, cols) shard.

        Equivalent result to `from_packed_rows`, but the host never
        materializes the full (d_pad, cols) block: at genome scale the
        first-touch page faults of one fresh multi-GB buffer cost
        minutes on lazily-ballooned VMs, and here they amortize across
        strips that upload while later strips are still being gathered
        — the fault+gather time hides entirely under the transfer.
        Transient device memory is 2x the resident block (strips + the
        concatenated shard), so callers should gate on that.

        `read_strip(lo, hi)` returns SANITIZED packed rows for global
        post-QC rows [lo, hi) (lo/hi never exceed n_rows).  Strips are
        row-padded/column-padded here with inert all-missing bytes.
        """
        mesh = mesh or make_mesh()
        n_dev = mesh.devices.size
        d_pad = _round_up(
            max(n_rows, 1),
            _row_pad_tile(tile_d, kernel_precision, packed=True) * n_dev,
        )
        n4_pad = packed_cols(n_samples)
        rows_per_dev = d_pad // n_dev
        flat = list(mesh.devices.flat)

        per_dev = []
        for di, dev in enumerate(flat):
            dev_lo = di * rows_per_dev
            chunks = []
            for lo in range(dev_lo, dev_lo + rows_per_dev, strip_rows):
                hi = min(lo + strip_rows, dev_lo + rows_per_dev)
                buf = np.full(
                    (hi - lo, n4_pad), PACKED_MISSING_BYTE, dtype=np.uint8
                )
                read_hi = min(hi, n_rows)
                if lo < read_hi:
                    rows = read_strip(lo, read_hi)
                    buf[: read_hi - lo, : rows.shape[1]] = rows
                chunks.append(jax.device_put(buf, dev))  # async upload
            per_dev.append(
                chunks[0]
                if len(chunks) == 1
                else jnp.concatenate(chunks, axis=0)
            )

        sh = NamedSharding(mesh, P(VARIANT_AXIS, None))
        geno = jax.make_array_from_single_device_arrays(
            (d_pad, n4_pad), sh, per_dev
        )
        m_pad = np.zeros((d_pad, 1), dtype=np.float32)
        m_pad[:n_rows, 0] = np.asarray(mean, dtype=np.float32)
        inv_pad = np.zeros((d_pad, 1), dtype=np.float32)
        inv_pad[:n_rows, 0] = inv_std_of(np.asarray(std, dtype=np.float32))
        return ShardedMatrix(
            geno=geno,
            mean=jax.device_put(m_pad, sh),
            inv_std=jax.device_put(inv_pad, sh),
            n_rows=n_rows,
            n_samples=n_samples,
            mesh=mesh,
            mode=mode,
            tile_d=tile_d,
            kernel_precision=kernel_precision,
            q8_polish=q8_polish,
            missing_fraction=missing_fraction,
        )

    # ------------------------------------------------------------------
    def _local_ops(self):
        """Local (per-shard) pass implementations for each backend mode."""
        tile_d = self.tile_d
        tile_n = self.tile_n
        precision = self.kernel_precision
        interpret = self.mode in ("pallas_interpret", "pallas2d_interpret")
        # "q8" = bf16 everywhere EXCEPT the power-iteration body, which
        # runs through the int8-MXU kernel (2x rate); the exact kernels
        # below still serve polish/tsq/right and every user-visible
        # product.
        local_gram_q8 = None
        if precision == "q8":
            precision = "bf16"
            if self.mode in ("pallas", "pallas_interpret"):
                if self.packed:
                    def local_gram_q8(g, iv, u, bq, sb, csum):
                        # Shape-aware tile: g/bq shapes are static at
                        # trace time, so the q8 tile can exceed the
                        # shared bf16 tile when the shard and VMEM
                        # allow (see _q8_packed_tile_d).
                        t = _q8_packed_tile_d(
                            g.shape[0], g.shape[1], bq.shape[1], tile_d
                        )
                        return pk.fused_gram_q8_packed(
                            g, iv, u, bq, sb, csum, tile_d=t,
                            interpret=interpret,
                        )
                else:
                    def local_gram_q8(g, iv, u, bq, sb, csum):
                        return pk.fused_gram_q8(
                            g, iv, u, bq, sb, csum, tile_d=tile_d,
                            interpret=interpret,
                        )

            elif self.mode in ("pallas2d", "pallas2d_interpret"):
                # Biobank-wide sample axes: the W/T split through the
                # 2-D tiled int8-MXU kernels, standardization
                # corrections + per-row-tile re-quantization in XLA on
                # the small (D, L) intermediate (pk.q8_power_pass_2d).
                _is_packed = self.packed

                def local_gram_q8(g, iv, u, bq, sb, csum):
                    t = (
                        _q8_packed_tile_d_2d(
                            g.shape[0], tile_n, bq.shape[1], tile_d
                        )
                        if _is_packed
                        else tile_d
                    )
                    return pk.q8_power_pass_2d(
                        g, iv, u, bq, sb, csum, tile_d=t,
                        tile_n=tile_n, interpret=interpret,
                    )

        if self.mode in ("pallas2d", "pallas2d_interpret"):
            if self.packed:
                right2d, left2d = (
                    pk.fused_right_apply_2d_packed,
                    pk.fused_left_apply_2d_packed,
                )
                tile_kw = dict(tile_d=tile_d, tile_n4=tile_n)
            else:
                right2d, left2d = pk.fused_right_apply_2d, pk.fused_left_apply_2d
                tile_kw = dict(tile_d=tile_d, tile_n=tile_n)

            def local_right(g, m, iv, b):
                return right2d(
                    g, m, iv, b, precision=precision, interpret=interpret,
                    **tile_kw,
                )

            def local_gram(g, m, iv, b):
                w = local_right(g, m, iv, b)
                return left2d(
                    g, m, iv, w, precision=precision, interpret=interpret,
                    **tile_kw,
                )

            def local_tsq(g, m, iv, b):
                w = local_right(g, m, iv, b)
                return jnp.dot(
                    w.T, w, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )

        elif self.mode in ("pallas", "pallas_interpret"):
            if self.packed:
                gram_fn, tsq_fn, right_fn = (
                    pk.fused_gram_apply_packed,
                    pk.fused_tsq_packed,
                    pk.fused_right_apply_packed,
                )
            else:
                gram_fn, tsq_fn, right_fn = (
                    pk.fused_gram_apply, pk.fused_tsq, pk.fused_right_apply
                )

            def local_gram(g, m, iv, b):
                return gram_fn(
                    g, m, iv, b, tile_d=tile_d, precision=precision,
                    interpret=interpret,
                )

            def local_tsq(g, m, iv, b):
                return tsq_fn(
                    g, m, iv, b, tile_d=tile_d, precision=precision,
                    interpret=interpret,
                )

            def local_right(g, m, iv, b):
                return right_fn(
                    g, m, iv, b, tile_d=tile_d, precision=precision,
                    interpret=interpret,
                )

        else:  # "xla": strip-scan fallback, f32 HIGHEST
            packed = self.packed

            def _scan(g, m, iv, b, want: str):
                d_loc = g.shape[0]
                n_strips = d_loc // tile_d
                g3 = g.reshape(n_strips, tile_d, g.shape[1])
                m2 = m.reshape(n_strips, tile_d)
                i2 = iv.reshape(n_strips, tile_d)

                def std(gg, mm, ii):
                    # Packed strips standardize into the same plane-major
                    # sample order the Pallas kernels use, so b/outputs
                    # share one permutation convention across modes.
                    if packed:
                        return _unpack_planes_std(
                            gg, mm[:, None], ii[:, None]
                        )
                    return _standardize(gg, mm, ii)

                if want == "right":
                    def body(_, xs):
                        gg, mm, ii = xs
                        return None, _dot(std(gg, mm, ii), b)

                    _, out = jax.lax.scan(body, None, (g3, m2, i2))
                    return out.reshape(d_loc, b.shape[1])

                shape = (
                    (b.shape[0], b.shape[1]) if want == "gram"
                    else (b.shape[1], b.shape[1])
                )

                def body(acc, xs):
                    gg, mm, ii = xs
                    a = std(gg, mm, ii)
                    w = _dot(a, b)
                    if want == "gram":
                        return acc + _dot(a.T, w), None
                    return acc + _dot(w.T, w), None

                acc, _ = jax.lax.scan(
                    body, jnp.zeros(shape, jnp.float32), (g3, m2, i2)
                )
                return acc

            def local_gram(g, m, iv, b):
                return _scan(g, m[:, 0], iv[:, 0], b, "gram")

            def local_tsq(g, m, iv, b):
                return _scan(g, m[:, 0], iv[:, 0], b, "tsq")

            def local_right(g, m, iv, b):
                return _scan(g, m[:, 0], iv[:, 0], b, "right")

        return local_gram, local_tsq, local_right, local_gram_q8

    def _build_kernels(self) -> None:
        mesh = self.mesh
        vspec = P(VARIANT_AXIS, None)
        rep = P(None, None)
        local_gram, local_tsq, local_right, local_gram_q8 = self._local_ops()

        # check_vma=False: pallas_call outputs carry no varying-manual-axes
        # annotation, which the vma type check can't see through.
        smap = functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(vspec, vspec, vspec, rep),
            check_vma=False,
        )

        @functools.partial(smap, out_specs=rep)
        def gram_sm(g, m, iv, b):
            return jax.lax.psum(local_gram(g, m, iv, b), VARIANT_AXIS)

        @functools.partial(smap, out_specs=rep)
        def tsq_sm(g, m, iv, b):
            return jax.lax.psum(local_tsq(g, m, iv, b), VARIANT_AXIS)

        if local_gram_q8 is not None:
            @functools.partial(
                shard_map,
                mesh=mesh,
                in_specs=(vspec, vspec, vspec, rep, rep, rep),
                out_specs=rep,
                check_vma=False,
            )
            def gram_q8_sm(g, m, iv, bq, sb, csum):
                u = m * iv  # (d_loc, 1), cheap per-shard
                o, ru = local_gram_q8(g, iv, u, bq, sb, csum)
                # T = G0^T(s.y) - 1 (u^T y): the rank-1 term broadcasts
                # over sample rows, so fold it before the psum.
                return jax.lax.psum(o - ru, VARIANT_AXIS)

        @functools.partial(smap, out_specs=vspec)
        def right_sm(g, m, iv, b):
            return local_right(g, m, iv, b)

        # A^T W with W variant-sharded like the genotypes: the device
        # path for projecting NEW samples through fitted loadings
        # (PCA::transform, main.rs:659-660).  One pass, not a hot loop,
        # so a fused XLA strip scan (full-row unpack for packed data)
        # suffices on every backend mode.
        lt_tile = self.tile_d
        lt_packed = self.packed

        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(vspec, vspec, vspec, vspec),
            out_specs=rep,
            check_vma=False,
        )
        def left_sm(g, m, iv, w):
            d_loc = g.shape[0]
            n_strips = d_loc // lt_tile
            g3 = g.reshape(n_strips, lt_tile, g.shape[1])
            m3 = m.reshape(n_strips, lt_tile, 1)
            i3 = iv.reshape(n_strips, lt_tile, 1)
            w3 = w.reshape(n_strips, lt_tile, w.shape[1])
            cols = (4 * g.shape[1]) if lt_packed else g.shape[1]

            def body(acc, xs):
                gg, mm, ii, ww = xs
                if lt_packed:
                    a = _unpack_planes_std(gg, mm, ii)  # plane-major
                else:
                    a = _standardize(gg, mm[:, 0], ii[:, 0])
                return acc + _dot(a.T, ww), None

            acc, _ = jax.lax.scan(
                body, jnp.zeros((cols, w.shape[1]), jnp.float32),
                (g3, m3, i3, w3),
            )
            return jax.lax.psum(acc, VARIANT_AXIS)

        n_samples = self.n_samples
        n_pad = self.n_pad
        pallas = self.mode.startswith("pallas")
        packed = self.packed
        if packed:
            # Trace-time constants: the kernels' plane-major sample
            # permutation and its inverse (ops/pallas_kernels.py).
            perm_np = self._perm
            invp_np = self._invp
            # 1.0 at permuted positions holding a REAL sample (defensive
            # zeroing of padding rows inside the power loop).
            pmask_np = (perm_np < n_samples).astype(np.float32)[:, None]

        def pad_b(b):
            n, ell = b.shape
            ell_pad = _round_up(ell, 128) if pallas else ell
            out = jnp.zeros((n_pad, ell_pad), dtype=jnp.float32)
            out = out.at[:n, :ell].set(b)
            if packed:
                out = jnp.take(out, jnp.asarray(perm_np), axis=0)
            return out

        def unperm(t):
            """Permuted sample rows -> original order (packed only)."""
            if packed:
                return jnp.take(t, jnp.asarray(invp_np), axis=0)
            return t

        # Fully-jitted wrappers: padding, the sharded pass, and the
        # un-padding slice form ONE executable each — a single device
        # dispatch per pass (vital on high-latency relayed backends).
        @jax.jit
        def gram_k(g, m, iv, b):
            ell = b.shape[1]
            return unperm(gram_sm(g, m, iv, pad_b(b)))[:n_samples, :ell]

        @jax.jit
        def tsq_k(g, m, iv, b):
            ell = b.shape[1]
            return tsq_sm(g, m, iv, pad_b(b))[:ell, :ell]

        @jax.jit
        def right_k(g, m, iv, b):
            ell = b.shape[1]
            return right_sm(g, m, iv, pad_b(b))[:, :ell]

        if packed:
            # left_sm unpacks FULL-width rows, so its sample axis rides
            # the full plane-major permutation regardless of the
            # container's (possibly tile-local) hot-path perm.
            invp_full = np.argsort(pk.plane_major_perm(n_pad))

        @jax.jit
        def left_k(g, m, iv, w):
            out = left_sm(g, m, iv, w)
            if packed:
                out = jnp.take(out, jnp.asarray(invp_full), axis=0)
            return out[:n_samples]

        # Two-pass Cholesky-QR: MXU-only orthonormalization between
        # power-iteration steps (ops/rsvd.cholqr2_q — one shared
        # implementation with the fused stage-1 rSVD stabilizer).
        # Callers needing exact orthonormality run one final Householder
        # QR outside the loop.
        cholqr2 = cholqr2_q

        def zero_pad_rows(t):
            if packed:
                return t * jnp.asarray(pmask_np)
            return t.at[n_samples:, :].set(0.0)

        use_q8 = local_gram_q8 is not None
        # With q8 enabled the LAST power iteration(s) always run through
        # the exact bf16 kernel: the quantized passes only steer the
        # subspace (8-bit rounding + the missing->raw-0 approximation,
        # ops/pallas_kernels.py q8 notes); the exact polish passes before
        # the Rayleigh-Ritz restore bf16-path quality (|r| >= 0.99999 vs
        # float64, tests/test_q8.py; count resolved per the observed
        # missingness bound — `resolve_q8_polish`).
        q8_polish = self.q8_polish

        def power_loop(g, m, iv, bp, n_iter, tol=None):
            """Subspace iteration; returns (basis, n_iterations_done).

            `tol` (static) switches the steering loop to a while_loop
            that exits once the relative subspace residual
            ||T - B(B^T T)||_F / ||T||_F of a pass drops below tol —
            the `rfit` tolerance contract
            (/root/reference/src/main.rs:648-656).  Exact polish passes
            (q8 discipline) always run in full.
            """
            def t_exact(cur):
                return zero_pad_rows(gram_sm(g, m, iv, cur))

            def t_q8(cur):
                bq, sb, csum = quantize_basis(cur)
                return zero_pad_rows(gram_q8_sm(g, m, iv, bq, sb, csum))

            def run(tfn, max_n, b0):
                if tol is None:
                    out = jax.lax.fori_loop(
                        0, max_n, lambda _, cur: cholqr2(tfn(cur)), b0
                    )
                    return out, jnp.int32(max_n)

                def cond(c):
                    i, _b, res = c
                    return (i < max_n) & (res >= tol)

                def body(c):
                    i, cur, _res = c
                    t = tfn(cur)
                    # Residual of t against the incoming basis.  On the
                    # first pass `cur` is the raw random sketch (not yet
                    # orthonormal), so the residual is meaningless there
                    # — pin it to inf so the loop can never exit before
                    # one full orthonormalized pass (matches the i > 0
                    # guard of the host and streaming loops).
                    res = jnp.where(
                        i > 0, subspace_residual(cur, t), jnp.float32(jnp.inf)
                    )
                    return i + 1, cholqr2(t), res

                i, out, _ = jax.lax.while_loop(
                    cond, body, (jnp.int32(0), b0, jnp.float32(jnp.inf))
                )
                return out, i

            if not use_q8:
                return run(t_exact, n_iter, bp)
            n_q8 = max(n_iter - q8_polish, 0)
            out, i1 = run(t_q8, n_q8, bp)
            # The mandated exact polish passes ALWAYS run in full — the
            # adaptive polish count is the accuracy guarantee of the q8
            # approximation (resolve_q8_polish), not a convergence
            # heuristic a loose tolerance may skip.  Same semantics as
            # StreamingMatrix.power_iterate.
            n_polish = n_iter - n_q8
            out = jax.lax.fori_loop(
                0, n_polish, lambda _, cur: cholqr2(t_exact(cur)), out
            )
            return out, i1 + n_polish

        # Whole power-iteration loop on device: n_iter x (gram -> CholQR).
        @functools.partial(jax.jit, static_argnames=("n_iter", "tol"))
        def power_k(g, m, iv, b, n_iter, tol=None):
            out, n_done = power_loop(g, m, iv, pad_b(b), n_iter, tol)
            # One exact Householder QR to finish.
            q, _ = jnp.linalg.qr(out)
            return unperm(q)[:n_samples, : b.shape[1]], n_done

        # The ENTIRE randomized PCA as one XLA program: power iterations,
        # condensed eigensolve, scores, and (variant-sharded) loadings.
        # On remote-compile backends each program costs minutes to build,
        # so one fused program beats three (power/tsq/right) by ~3x in
        # end-to-end compile time and saves the intermediate dispatches.
        @functools.partial(jax.jit, static_argnames=("n_iter", "k", "tol"))
        def pca_core_k(g, m, iv, b, n_iter, k, tol=None):
            out, n_done = power_loop(g, m, iv, pad_b(b), n_iter, tol)
            q, _ = jnp.linalg.qr(out)  # (n_pad, l_pad) orthonormal
            gram = tsq_sm(g, m, iv, q)  # (l_pad, l_pad)
            ell = b.shape[1]
            gram = gram[:ell, :ell]
            evals, w = jnp.linalg.eigh(gram)
            order = jnp.argsort(-evals)
            evals = jnp.maximum(evals[order], 0.0)
            w = w[:, order]
            sigma = jnp.sqrt(evals)
            v_full = q[:, :ell] @ w  # (n_pad, ell) right singular vectors
            v_k = v_full[:, :k]
            # loadings U = A V / sigma, variant-sharded output
            vp = jnp.zeros((q.shape[0], _round_up(k, 128) if pallas else k),
                           dtype=jnp.float32)
            vp = vp.at[:, :k].set(v_k)
            c = right_sm(g, m, iv, vp)[:, :k]  # (d_pad, k) = A V
            inv_sigma = jnp.where(sigma[:k] > 0, 1.0 / jnp.where(
                sigma[:k] > 0, sigma[:k], 1.0), 0.0)
            loadings = c * inv_sigma[None, :]
            return (
                # right singular vectors (N, k); v_full rides in permuted
                # sample order on the packed path (q never left it)
                unperm(v_full)[:n_samples, :k],
                sigma[:k],
                evals[:k],
                loadings,  # (d_pad, k), caller slices rows
                n_done,
            )

        self._gram_k = gram_k
        self._tsq_k = tsq_k
        self._right_k = right_k
        self._left_k = left_k
        self._power_k = power_k
        self._pca_core_k = pca_core_k

    # ---- segmented row layout helpers ---------------------------------
    def translate_row_runs(
        self, starts: np.ndarray, lens: np.ndarray
    ) -> np.ndarray:
        """PcaSnpId run starts -> matrix-row starts under the segmented
        layout.  Raises if any run crosses a segment boundary (callers
        gate on `runs_device_sliceable` first)."""
        starts = np.asarray(starts, dtype=np.int64)
        if self.row_segments is None:
            return starts
        seg = self.row_segments
        # Segment of each run: last segment with pca_start <= start.
        si = np.searchsorted(seg[:, 1], starts, side="right") - 1
        si = np.clip(si, 0, len(seg) - 1)
        ends = np.asarray(lens, dtype=np.int64) + starts
        inside = (starts >= seg[si, 1]) & (ends <= seg[si, 1] + seg[si, 2])
        # Zero-length padding runs (batch fill) translate to row 0.
        inside |= np.asarray(lens, dtype=np.int64) == 0
        if not bool(inside.all()):
            raise ValueError(
                "block run crosses a row-segment boundary; use the host "
                "accessor path for this block file"
            )
        out = seg[si, 0] + (starts - seg[si, 1])
        return np.where(np.asarray(lens, dtype=np.int64) == 0, 0, out)

    def runs_device_sliceable(self, runs: np.ndarray) -> bool:
        """True when every (start, len) run stays inside one row
        segment, i.e. `fetch_blocks_device` can slice it contiguously."""
        try:
            self.translate_row_runs(runs[:, 0], runs[:, 1])
            return True
        except ValueError:
            return False

    def _trim_rows(self, arr: np.ndarray) -> np.ndarray:
        """(d_pad, ...) host array -> (n_rows, ...) real rows in
        PcaSnpId order (drops inter-segment and tail padding)."""
        if self.row_segments is None:
            return arr[: self.n_rows]
        out = np.empty((self.n_rows,) + arr.shape[1:], dtype=arr.dtype)
        for mstart, pstart, cnt in self.row_segments:
            out[pstart : pstart + cnt] = arr[mstart : mstart + cnt]
        return out

    @property
    def _segments_or_default(self) -> np.ndarray:
        if self.row_segments is None:
            return np.array([[0, 0, self.n_rows]], dtype=np.int64)
        return self.row_segments

    # ---- device-resident block access ---------------------------------
    def fetch_blocks_device(
        self,
        starts: np.ndarray,  # (B,) global row starts (PcaSnpId space)
        lens: np.ndarray,  # (B,) block lengths
        bucket: int,
        col_idx: Optional[jax.Array] = None,
    ) -> jax.Array:
        """(B, bucket, C) f32 standardized blocks sliced from the
        HBM-resident int8 matrix — no host round-trip.

        The device analog of the host accessor's
        `fetch_block_standardized` for blocks that are contiguous
        PcaSnpId runs; rows beyond each block's length are zero.
        `starts` are PcaSnpId positions; the segmented layout translates
        them to matrix rows (`translate_row_runs`).
        """
        bucket = min(bucket, self.d_pad)
        if int(np.max(lens)) > bucket:
            raise ValueError(f"block longer than bucket: {np.max(lens)} > {bucket}")
        slicer = (
            _slice_blocks_standardized_packed
            if self.packed
            else _slice_blocks_standardized
        )
        return slicer(
            self.geno,
            self.mean,
            self.inv_std,
            jnp.asarray(self.translate_row_runs(starts, lens), dtype=jnp.int32),
            jnp.asarray(np.asarray(lens), dtype=jnp.int32),
            col_idx,
            bucket,
        )

    def count_missing(self) -> int:
        """Number of missing genotypes among real rows/columns (one
        scalar download; supports the strict `missing_policy="error"`
        accessor semantics on the device path).

        Runs under `jax.enable_x64`: without it the int64 accumulators
        silently truncate to int32, which overflows at genome scale
        (>2^31 missing entries wraps negative or, worse, to a small
        positive count)."""

        segments = tuple(
            (int(m), int(c)) for m, _p, c in self._segments_or_default
        )

        if self.packed:
            n4 = self.geno.shape[1]
            n_samples = self.n_samples

            def count_packed(g):
                miss = jnp.zeros((), jnp.int64)
                for mstart, cnt in segments:
                    c = g[mstart : mstart + cnt].astype(jnp.int32)
                    for p in range(4):
                        cp = (c >> (2 * p)) & 3
                        # sample index of plane p, byte j is 4j + p
                        sample = 4 * jnp.arange(n4) + p
                        valid_col = (sample < n_samples)[None, :]
                        miss += jnp.sum(
                            (cp == 1) & valid_col, dtype=jnp.int64
                        )
                return miss

            with jax.enable_x64(True):
                return int(np.asarray(jax.jit(count_packed)(self.geno)))

        def count(g):
            miss = jnp.zeros((), jnp.int64)
            for mstart, cnt in segments:
                real = g[mstart : mstart + cnt, : self.n_samples]
                miss += jnp.sum(real == MISSING, dtype=jnp.int64)
            return miss

        with jax.enable_x64(True):
            return int(np.asarray(jax.jit(count)(self.geno)))

    def _rows_to_host(self, arr: jax.Array) -> np.ndarray:
        """Materialize a variant-sharded (d_pad, k) output on every host.

        Single-process arrays are fully addressable; multi-process ones
        span other hosts' devices, so each process concatenates its own
        contiguous row shards (mesh order) and a tiled
        `process_allgather` assembles the global block — the only
        cross-host traffic the output path needs (k columns, not the
        genotype matrix).
        """
        if jax.process_count() == 1:
            return np.asarray(arr)
        from jax.experimental import multihost_utils

        shards = sorted(
            arr.addressable_shards,
            key=lambda s: s.index[0].start or 0,
        )
        local = np.concatenate([np.asarray(s.data) for s in shards], axis=0)
        return np.asarray(multihost_utils.process_allgather(local, tiled=True))

    # ---- public passes (each ONE device dispatch) --------------------
    def gram_apply(self, b: jax.Array) -> jax.Array:
        """A^T (A B): (n_samples, l), replicated."""
        return self._gram_k(self.geno, self.mean, self.inv_std, b)

    def tsq_accumulate(self, b: jax.Array) -> jax.Array:
        """(A B)^T (A B): (l, l), replicated."""
        return self._tsq_k(self.geno, self.mean, self.inv_std, b)

    def right_apply(self, b: jax.Array) -> np.ndarray:
        """A B on host with padding removed: (n_rows, l)."""
        out = self._right_k(self.geno, self.mean, self.inv_std, b)
        return self._trim_rows(self._rows_to_host(out))

    def left_apply(self, w: np.ndarray) -> np.ndarray:
        """A^T W: (n_samples, k) for row-space W (n_rows, k) in PcaSnpId
        order.

        The device projection path (standardize + contraction over the
        variant axis under shard_map, psum-merged): with A built from
        NEW samples and the TRAINING moments, `left_apply(loadings)` is
        `PCA::transform` (/root/reference/src/main.rs:659-660) on
        device.  Padding rows are inert (inv_std = 0)."""
        w = np.asarray(w, dtype=np.float32)
        if w.ndim != 2 or w.shape[0] != self.n_rows:
            raise ValueError(
                f"left_apply expects ({self.n_rows}, k), got {w.shape}"
            )
        k = w.shape[1]
        w_pad = np.zeros((self.d_pad, k), dtype=np.float32)
        for mstart, pstart, cnt in self._segments_or_default:
            w_pad[mstart : mstart + cnt] = w[pstart : pstart + cnt]
        sh = NamedSharding(self.mesh, P(VARIANT_AXIS, None))
        if jax.process_count() == 1:
            w_dev = jax.device_put(w_pad, sh)
        else:
            flat = list(self.mesh.devices.flat)
            rows_per_dev = self.d_pad // len(flat)
            proc = jax.process_index()
            idxs = [
                i for i, d in enumerate(flat) if d.process_index == proc
            ]
            lo = min(idxs) * rows_per_dev
            hi = (max(idxs) + 1) * rows_per_dev
            w_dev = jax.make_array_from_process_local_data(
                sh, w_pad[lo:hi], (self.d_pad, k)
            )
        return np.asarray(
            self._left_k(self.geno, self.mean, self.inv_std, w_dev)
        )

    def power_iterate(
        self, b0: jax.Array, n_iter: int, tolerance: Optional[float] = None
    ) -> jax.Array:
        """n_iter x (B <- qr(A^T A B)) entirely on device: (n_samples, l)
        orthonormal basis.  One dispatch for the whole loop.  With
        `tolerance` the loop early-exits on the subspace residual and
        the return is (basis, n_iterations_done)."""
        q, n_done = self._power_k(
            self.geno, self.mean, self.inv_std, b0, n_iter, tolerance
        )
        if tolerance is None:
            return q
        return q, int(n_done)

    def pca_core(
        self,
        b0: jax.Array,
        n_iter: int,
        k: int,
        tolerance: Optional[float] = None,
    ):
        """Full randomized PCA in ONE program/dispatch.

        Returns (v, sigma, evals, loadings): right singular vectors
        (n_samples, k), singular values (k,), their squares (k,), and
        loadings (n_rows, k) on host.  With `tolerance` the power loop
        early-exits (rfit tolerance contract, main.rs:648-656) and a
        fifth element — the iteration count actually run — is returned.
        """
        v, sigma, evals, loadings, n_done = self._pca_core_k(
            self.geno, self.mean, self.inv_std, b0, n_iter, k, tolerance
        )
        out = (v, sigma, evals, self._trim_rows(self._rows_to_host(loadings)))
        if tolerance is None:
            return out
        return out + (int(n_done),)

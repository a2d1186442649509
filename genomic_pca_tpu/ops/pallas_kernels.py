"""Pallas TPU kernels: fused int8-dequant + standardize + GEMM.

The hot loop of the framework is the power-iteration pass
T = A^T (A B) over the implicit standardized matrix
A = diag(inv_std) (G - mean) with G int8 (missing = -127 -> 0).  XLA
partially materializes the standardized f32/bf16 strip in HBM, tripling
memory traffic; these kernels read each int8 tile exactly once into
VMEM, standardize on the VPU, and run both MXU matmuls while the tile is
resident — the pass runs at int8 HBM-read speed-of-light.

This is the TPU analog of the reference's fused SIMD standardize+FMA
kernel (/root/reference/src/prepare.rs:1946-2013) but fused further into
the consuming GEMMs (the reference hands standardized f32 blocks to
BLAS; here the dequant never touches HBM).

Kernels (all over a row-tiled grid, accumulating into VMEM outputs):

  gram_kernel : out(N, L)  = A^T (A B)     -- power iteration pass
  right_kernel: out(D, L)  = A B           -- loadings / projections
  tsq_kernel  : out(L, L)  = (A B)^T (A B) -- condensed Gram

Precision: genotype values are small integers, exactly representable in
bfloat16; the standardized tile and B are cast to bf16 for the MXU with
f32 accumulation (`preferred_element_type`).  Relative error per product
~4e-3 averages out over the D-dimensional contraction (error ~4e-3/sqrt(D)
on Gram entries) — far below the |r| > 0.999 concordance bar; the exact
f32 path (`precision="f32"`) is available for validation.

Shape contract: D % tile_d == 0, N % 128 == 0, L % 128 == 0.  Callers pad
rows with inv_std = 0 (standardize to zero), sample columns with -127
(missing -> zero), and B columns with zeros; padded dimensions contribute
nothing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MISSING = -127


def _prec(dtype):
    # "f32" mode must force 3-pass f32 on the MXU; DEFAULT would silently
    # run bf16 passes and give bf16-class error despite f32 inputs.
    return (
        jax.lax.Precision.HIGHEST
        if dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def _standardize_tile(g, mean_col, inv_col, out_dtype):
    """(tile_d, n) int8 -> standardized out_dtype on the VPU.

    f32 mode: mask via an f32 compare (int8 values are exactly
    representable; Mosaic v5e supports neither int8 nor bf16 vector
    compares).

    bf16 mode: compare-free arithmetic mask
    ``clamp(g + 127, 0, 1)`` — exact in bf16 (dosages map to
    127/128/129, all representable; the -127 sentinel maps to 0), so no
    f32 intermediate materializes and the VMEM working set halves.  The
    bf16-rounded scale/shift perturb each SNP's standardization by
    <=0.4% relative, inside the bf16 error budget.
    """
    if out_dtype == jnp.bfloat16:
        gb = g.astype(jnp.bfloat16)
        mask = jnp.clip(gb + jnp.bfloat16(127.0), 0.0, 1.0)
        x = gb * inv_col.astype(jnp.bfloat16) + (
            -mean_col * inv_col
        ).astype(jnp.bfloat16)
        return x * mask
    gf = g.astype(jnp.float32)
    x = gf * inv_col + (-mean_col * inv_col)
    x = jnp.where(gf != float(MISSING), x, 0.0)
    return x.astype(out_dtype)


def _make_specs(tile_d: int, n: int, ell: int):
    in_specs = [
        pl.BlockSpec((tile_d, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_d, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_d, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((n, ell), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    return in_specs


def _gram_kernel(g_ref, m_ref, iv_ref, b_ref, out_ref, *, compute_dtype):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    x = _standardize_tile(g_ref[:], m_ref[:], iv_ref[:], compute_dtype)
    b = b_ref[:].astype(compute_dtype)
    prec = _prec(compute_dtype)
    w = jnp.dot(x, b, preferred_element_type=jnp.float32, precision=prec)
    out_ref[:] += jnp.dot(
        x.T, w.astype(compute_dtype),
        preferred_element_type=jnp.float32, precision=prec,
    )


def _right_kernel(g_ref, m_ref, iv_ref, b_ref, out_ref, *, compute_dtype):
    x = _standardize_tile(g_ref[:], m_ref[:], iv_ref[:], compute_dtype)
    b = b_ref[:].astype(compute_dtype)
    out_ref[:] = jnp.dot(
        x, b, preferred_element_type=jnp.float32, precision=_prec(compute_dtype)
    )


def _tsq_kernel(g_ref, m_ref, iv_ref, b_ref, out_ref, *, compute_dtype):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    x = _standardize_tile(g_ref[:], m_ref[:], iv_ref[:], compute_dtype)
    b = b_ref[:].astype(compute_dtype)
    prec = _prec(compute_dtype)
    w = jnp.dot(x, b, preferred_element_type=jnp.float32, precision=prec)
    wc = w.astype(compute_dtype)
    out_ref[:] += jnp.dot(
        wc.T, wc, preferred_element_type=jnp.float32, precision=prec
    )


def _compute_dtype(precision: str):
    return jnp.float32 if precision == "f32" else jnp.bfloat16


@functools.partial(
    jax.jit, static_argnames=("tile_d", "precision", "interpret")
)
def fused_gram_apply(
    geno: jax.Array,  # (D, N) int8
    mean: jax.Array,  # (D, 1) f32
    inv_std: jax.Array,  # (D, 1) f32
    b: jax.Array,  # (N, L) f32
    tile_d: int = 512,
    precision: str = "bf16",
    interpret: bool = False,
) -> jax.Array:
    """A^T (A B): (N, L) f32."""
    d, n = geno.shape
    ell = b.shape[1]
    assert d % tile_d == 0, (d, tile_d)
    kernel = functools.partial(
        _gram_kernel, compute_dtype=_compute_dtype(precision)
    )
    return pl.pallas_call(
        kernel,
        grid=(d // tile_d,),
        in_specs=_make_specs(tile_d, n, ell),
        out_specs=pl.BlockSpec((n, ell), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, ell), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * d * n * ell, bytes_accessed=d * n + n * ell * 8, transcendentals=0
        ),
        # The revisited output accumulates across grid steps — the grid
        # must execute sequentially, not be parallelized by Mosaic.
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=interpret,
    )(geno, mean, inv_std, b)


@functools.partial(
    jax.jit, static_argnames=("tile_d", "precision", "interpret")
)
def fused_right_apply(
    geno: jax.Array,
    mean: jax.Array,
    inv_std: jax.Array,
    b: jax.Array,
    tile_d: int = 512,
    precision: str = "bf16",
    interpret: bool = False,
) -> jax.Array:
    """A B: (D, L) f32."""
    d, n = geno.shape
    ell = b.shape[1]
    assert d % tile_d == 0, (d, tile_d)
    kernel = functools.partial(
        _right_kernel, compute_dtype=_compute_dtype(precision)
    )
    return pl.pallas_call(
        kernel,
        grid=(d // tile_d,),
        in_specs=_make_specs(tile_d, n, ell),
        out_specs=pl.BlockSpec(
            (tile_d, ell), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((d, ell), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * d * n * ell, bytes_accessed=d * n + d * ell * 4, transcendentals=0
        ),
        interpret=interpret,
    )(geno, mean, inv_std, b)


@functools.partial(
    jax.jit, static_argnames=("tile_d", "precision", "interpret")
)
def fused_tsq(
    geno: jax.Array,
    mean: jax.Array,
    inv_std: jax.Array,
    b: jax.Array,
    tile_d: int = 512,
    precision: str = "bf16",
    interpret: bool = False,
) -> jax.Array:
    """(A B)^T (A B): (L, L) f32."""
    d, n = geno.shape
    ell = b.shape[1]
    assert d % tile_d == 0, (d, tile_d)
    kernel = functools.partial(
        _tsq_kernel, compute_dtype=_compute_dtype(precision)
    )
    return pl.pallas_call(
        kernel,
        grid=(d // tile_d,),
        in_specs=_make_specs(tile_d, n, ell),
        out_specs=pl.BlockSpec((ell, ell), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ell, ell), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * d * n * ell + 2 * d * ell * ell,
            bytes_accessed=d * n + ell * ell * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=interpret,
    )(geno, mean, inv_std, b)


# ---------------------------------------------------------------------------
# 2-D tiled kernels for wide sample axes (biobank N).
#
# The 1-D kernels above hold a full (tile_d, N) row block in VMEM; once
# N exceeds ~4k no row tile fits.  These variants tile BOTH axes.  The
# power-iteration pass then splits into two fused products with a small
# (D, L) f32 intermediate in HBM:
#     W = A B      (fused_right_apply_2d)
#     T = A^T W    (fused_left_apply_2d)
# which costs D*L*8 bytes of extra traffic — negligible against reading
# the D x N int8 block itself when N >> L — while the int8 tile is still
# read exactly once per product and standardized in VMEM.


def _right2d_kernel(g_ref, m_ref, iv_ref, b_ref, out_ref, *, compute_dtype):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    x = _standardize_tile(g_ref[:], m_ref[:], iv_ref[:], compute_dtype)
    b = b_ref[:].astype(compute_dtype)
    out_ref[:] += jnp.dot(
        x, b, preferred_element_type=jnp.float32,
        precision=_prec(compute_dtype),
    )


def _left2d_kernel(g_ref, m_ref, iv_ref, w_ref, out_ref, *, compute_dtype):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    x = _standardize_tile(g_ref[:], m_ref[:], iv_ref[:], compute_dtype)
    w = w_ref[:].astype(compute_dtype)
    out_ref[:] += jnp.dot(
        x.T, w, preferred_element_type=jnp.float32,
        precision=_prec(compute_dtype),
    )


@functools.partial(
    jax.jit, static_argnames=("tile_d", "tile_n", "precision", "interpret")
)
def fused_right_apply_2d(
    geno: jax.Array,  # (D, N) int8
    mean: jax.Array,  # (D, 1) f32
    inv_std: jax.Array,  # (D, 1) f32
    b: jax.Array,  # (N, L) f32
    tile_d: int = 512,
    tile_n: int = 2048,
    precision: str = "bf16",
    interpret: bool = False,
) -> jax.Array:
    """A B with both axes tiled: (D, L) f32."""
    d, n = geno.shape
    ell = b.shape[1]
    assert d % tile_d == 0 and n % tile_n == 0, (d, n, tile_d, tile_n)
    kernel = functools.partial(
        _right2d_kernel, compute_dtype=_compute_dtype(precision)
    )
    return pl.pallas_call(
        kernel,
        grid=(d // tile_d, n // tile_n),
        in_specs=[
            pl.BlockSpec((tile_d, tile_n), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_d, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_d, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, ell), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_d, ell), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, ell), jnp.float32),
        # Outer (row-block) dim touches disjoint outputs -> parallel;
        # inner dim accumulates -> sequential.
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * d * n * ell,
            bytes_accessed=d * n + d * ell * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(geno, mean, inv_std, b)


@functools.partial(
    jax.jit, static_argnames=("tile_d", "tile_n", "precision", "interpret")
)
def fused_left_apply_2d(
    geno: jax.Array,  # (D, N) int8
    mean: jax.Array,
    inv_std: jax.Array,
    w: jax.Array,  # (D, L) f32
    tile_d: int = 512,
    tile_n: int = 2048,
    precision: str = "bf16",
    interpret: bool = False,
) -> jax.Array:
    """A^T W with both axes tiled: (N, L) f32."""
    d, n = geno.shape
    ell = w.shape[1]
    assert d % tile_d == 0 and n % tile_n == 0, (d, n, tile_d, tile_n)
    kernel = functools.partial(
        _left2d_kernel, compute_dtype=_compute_dtype(precision)
    )
    return pl.pallas_call(
        kernel,
        grid=(n // tile_n, d // tile_d),
        in_specs=[
            pl.BlockSpec((tile_d, tile_n), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_d, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_d, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_d, ell), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, ell), lambda j, i: (j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, ell), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * d * n * ell,
            bytes_accessed=d * n + n * ell * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(geno, mean, inv_std, w)


# ---------------------------------------------------------------------------
# PLINK 2-bit packed kernels.
#
# The BED on-disk encoding IS the optimal HBM layout: 2 bits/genotype is
# 4x less capacity and read bandwidth than int8, and the bytes can be
# uploaded exactly as read from disk (no host decode).  These kernels
# consume a (tile_d, n4) uint8 tile (n4 = N_pad/4 packed bytes) and
# unpack on the VPU into FOUR SAMPLE PLANES concatenated along lanes —
# plane p holds original samples {4j + p} — because expanding one byte
# into 4 adjacent lanes would need a lane-interleave, while plane
# extraction is a pure elementwise shift.  Consequently every sample-
# indexed vector (B, outputs over samples) lives in "plane-major"
# permuted order: permuted position k <-> original sample
# 4*(k % n4) + k // n4.  Callers apply the (N-sized, trivial)
# permutation outside the kernel; see parallel/sharded.py.
#
# PLINK1 code semantics (count_A1, low bits first — io/bed.py LUT):
#   00 -> dosage 2, 01 -> missing, 10 -> 1, 11 -> 0,
# giving the branch-free identity  g = (4 - c) >> 1,  valid = (c != 1)
# on int32 plane codes (int32 vector ops are supported where the int8 /
# bf16 compares of the dense path are not).  Row padding is inert via
# inv_std = 0; column padding bytes are 0x55 (all-missing).


def _standardize_packed_tile(pk_tile, mean_col, inv_col, out_dtype):
    """(tile_d, n4) uint8 -> (tile_d, 4*n4) standardized, plane-major.

    Stays on the int32-lane decode: a SWAR byte-parallel variant
    (decode to sentinel int8, reuse the dense standardize tile) was
    measured SLOWER for float output (2.69 vs 2.19 ms/iter at the
    bench shape) — the int8->bf16 relayout cast costs more than the
    4x-fewer-lanes decode saves.  The q8 kernels keep their SWAR
    unpack because their MXU operand IS int8 (no cast at all;
    VALIDATION.md round-3 unpack table)."""
    c = pk_tile.astype(jnp.int32)
    scale = inv_col.astype(out_dtype)
    shift = (-mean_col * inv_col).astype(out_dtype)
    planes = []
    for p in range(4):
        cp = (c >> (2 * p)) & 3
        gi = (4 - cp) >> 1
        x = gi.astype(out_dtype) * scale + shift
        x = jnp.where(cp != 1, x, jnp.zeros_like(x))
        planes.append(x)
    return jnp.concatenate(planes, axis=1)


def _packed_specs(tile_d: int, n4: int, ell: int):
    return [
        pl.BlockSpec((tile_d, n4), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_d, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_d, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((4 * n4, ell), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]


def _gram_packed_kernel(g_ref, m_ref, iv_ref, b_ref, out_ref, *, compute_dtype):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    x = _standardize_packed_tile(g_ref[:], m_ref[:], iv_ref[:], compute_dtype)
    b = b_ref[:].astype(compute_dtype)
    prec = _prec(compute_dtype)
    w = jnp.dot(x, b, preferred_element_type=jnp.float32, precision=prec)
    out_ref[:] += jnp.dot(
        x.T, w.astype(compute_dtype),
        preferred_element_type=jnp.float32, precision=prec,
    )


def _right_packed_kernel(g_ref, m_ref, iv_ref, b_ref, out_ref, *, compute_dtype):
    x = _standardize_packed_tile(g_ref[:], m_ref[:], iv_ref[:], compute_dtype)
    b = b_ref[:].astype(compute_dtype)
    out_ref[:] = jnp.dot(
        x, b, preferred_element_type=jnp.float32, precision=_prec(compute_dtype)
    )


def _tsq_packed_kernel(g_ref, m_ref, iv_ref, b_ref, out_ref, *, compute_dtype):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    x = _standardize_packed_tile(g_ref[:], m_ref[:], iv_ref[:], compute_dtype)
    b = b_ref[:].astype(compute_dtype)
    prec = _prec(compute_dtype)
    w = jnp.dot(x, b, preferred_element_type=jnp.float32, precision=prec)
    wc = w.astype(compute_dtype)
    out_ref[:] += jnp.dot(
        wc.T, wc, preferred_element_type=jnp.float32, precision=prec
    )


@functools.partial(
    jax.jit, static_argnames=("tile_d", "precision", "interpret")
)
def fused_gram_apply_packed(
    packed: jax.Array,  # (D, N4) uint8, PLINK 2-bit
    mean: jax.Array,  # (D, 1) f32
    inv_std: jax.Array,  # (D, 1) f32
    b: jax.Array,  # (4*N4, L) f32, PLANE-MAJOR sample order
    tile_d: int = 1024,
    precision: str = "bf16",
    interpret: bool = False,
) -> jax.Array:
    """A^T (A B): (4*N4, L) f32 in plane-major sample order."""
    d, n4 = packed.shape
    ell = b.shape[1]
    assert d % tile_d == 0, (d, tile_d)
    kernel = functools.partial(
        _gram_packed_kernel, compute_dtype=_compute_dtype(precision)
    )
    return pl.pallas_call(
        kernel,
        grid=(d // tile_d,),
        in_specs=_packed_specs(tile_d, n4, ell),
        out_specs=pl.BlockSpec((4 * n4, ell), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4 * n4, ell), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=16 * d * n4 * ell, bytes_accessed=d * n4 + n4 * ell * 32,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=interpret,
    )(packed, mean, inv_std, b)


@functools.partial(
    jax.jit, static_argnames=("tile_d", "precision", "interpret")
)
def fused_right_apply_packed(
    packed: jax.Array,
    mean: jax.Array,
    inv_std: jax.Array,
    b: jax.Array,  # (4*N4, L) plane-major
    tile_d: int = 1024,
    precision: str = "bf16",
    interpret: bool = False,
) -> jax.Array:
    """A B: (D, L) f32 (row space unchanged)."""
    d, n4 = packed.shape
    ell = b.shape[1]
    assert d % tile_d == 0, (d, tile_d)
    kernel = functools.partial(
        _right_packed_kernel, compute_dtype=_compute_dtype(precision)
    )
    return pl.pallas_call(
        kernel,
        grid=(d // tile_d,),
        in_specs=_packed_specs(tile_d, n4, ell),
        out_specs=pl.BlockSpec(
            (tile_d, ell), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((d, ell), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=8 * d * n4 * ell, bytes_accessed=d * n4 + d * ell * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(packed, mean, inv_std, b)


@functools.partial(
    jax.jit, static_argnames=("tile_d", "precision", "interpret")
)
def fused_tsq_packed(
    packed: jax.Array,
    mean: jax.Array,
    inv_std: jax.Array,
    b: jax.Array,  # (4*N4, L) plane-major
    tile_d: int = 1024,
    precision: str = "bf16",
    interpret: bool = False,
) -> jax.Array:
    """(A B)^T (A B): (L, L) f32 (sample-order invariant)."""
    d, n4 = packed.shape
    ell = b.shape[1]
    assert d % tile_d == 0, (d, tile_d)
    kernel = functools.partial(
        _tsq_packed_kernel, compute_dtype=_compute_dtype(precision)
    )
    return pl.pallas_call(
        kernel,
        grid=(d // tile_d,),
        in_specs=_packed_specs(tile_d, n4, ell),
        out_specs=pl.BlockSpec((ell, ell), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ell, ell), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=8 * d * n4 * ell + 2 * d * ell * ell,
            bytes_accessed=d * n4 + ell * ell * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=interpret,
    )(packed, mean, inv_std, b)


def plane_major_perm(n_pad: int) -> np.ndarray:
    """perm_to_orig: plane-major position k -> original sample index.

    Position k = p * n4 + j holds original sample 4j + p (PLINK packs
    sample 4j in the LOWEST 2 bits of byte j).  Use as B_perm = B[perm]
    and T = T_perm[inverse]; the inverse is `np.argsort(perm)`.
    """
    assert n_pad % 4 == 0
    n4 = n_pad // 4
    k = np.arange(n_pad, dtype=np.int64)
    return 4 * (k % n4) + k // n4


def plane_major_perm_tiled(n_pad: int, tile_n4: int) -> np.ndarray:
    """Tile-local plane-major permutation for the 2-D packed kernels.

    The 2-D kernels unpack one (tile_d, tile_n4) byte tile at a time, so
    each tile's four planes land contiguously: position
    k = t*(4*tile_n4) + p*tile_n4 + j holds original sample
    4*(t*tile_n4 + j) + p.  With tile_n4 == n4 this reduces exactly to
    `plane_major_perm` (one tile spanning all bytes).
    """
    assert n_pad % 4 == 0
    n4 = n_pad // 4
    assert n4 % tile_n4 == 0, (n4, tile_n4)
    k = np.arange(n_pad, dtype=np.int64)
    t, w = k // (4 * tile_n4), k % (4 * tile_n4)
    p, j = w // tile_n4, w % tile_n4
    return 4 * (t * tile_n4 + j) + p


# ---------------------------------------------------------------------------
# 2-D tiled packed kernels (biobank sample counts on the 2-bit layout).
#
# Same split as the dense 2-D pair — W = A B then T = A^T W with a small
# (D, L) f32 intermediate in HBM — but reading PLINK bytes (0.25 B per
# genotype).  Each grid step unpacks ONE (tile_d, tile_n4) byte tile on
# the VPU into its four sample planes; B/outputs over samples therefore
# ride in the TILE-LOCAL plane-major order of `plane_major_perm_tiled`
# (tile_n4 wide), applied by the caller exactly like the 1-D packed
# kernels' global permutation.


def _right2d_packed_kernel(g_ref, m_ref, iv_ref, b_ref, out_ref, *, compute_dtype):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    x = _standardize_packed_tile(g_ref[:], m_ref[:], iv_ref[:], compute_dtype)
    b = b_ref[:].astype(compute_dtype)
    out_ref[:] += jnp.dot(
        x, b, preferred_element_type=jnp.float32,
        precision=_prec(compute_dtype),
    )


def _left2d_packed_kernel(g_ref, m_ref, iv_ref, w_ref, out_ref, *, compute_dtype):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    x = _standardize_packed_tile(g_ref[:], m_ref[:], iv_ref[:], compute_dtype)
    w = w_ref[:].astype(compute_dtype)
    out_ref[:] += jnp.dot(
        x.T, w, preferred_element_type=jnp.float32,
        precision=_prec(compute_dtype),
    )


@functools.partial(
    jax.jit, static_argnames=("tile_d", "tile_n4", "precision", "interpret")
)
def fused_right_apply_2d_packed(
    packed: jax.Array,  # (D, N4) uint8, PLINK 2-bit
    mean: jax.Array,  # (D, 1) f32
    inv_std: jax.Array,  # (D, 1) f32
    b: jax.Array,  # (4*N4, L) f32, TILE-LOCAL plane-major order
    tile_d: int = 512,
    tile_n4: int = 512,
    precision: str = "bf16",
    interpret: bool = False,
) -> jax.Array:
    """A B with both axes tiled: (D, L) f32 (row space unchanged)."""
    d, n4 = packed.shape
    ell = b.shape[1]
    assert d % tile_d == 0 and n4 % tile_n4 == 0, (d, n4, tile_d, tile_n4)
    kernel = functools.partial(
        _right2d_packed_kernel, compute_dtype=_compute_dtype(precision)
    )
    return pl.pallas_call(
        kernel,
        grid=(d // tile_d, n4 // tile_n4),
        in_specs=[
            pl.BlockSpec((tile_d, tile_n4), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_d, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_d, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * tile_n4, ell), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_d, ell), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, ell), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * d * n4 * ell,
            bytes_accessed=d * n4 + d * ell * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(packed, mean, inv_std, b)


@functools.partial(
    jax.jit, static_argnames=("tile_d", "tile_n4", "precision", "interpret")
)
def fused_left_apply_2d_packed(
    packed: jax.Array,  # (D, N4) uint8
    mean: jax.Array,
    inv_std: jax.Array,
    w: jax.Array,  # (D, L) f32
    tile_d: int = 512,
    tile_n4: int = 512,
    precision: str = "bf16",
    interpret: bool = False,
) -> jax.Array:
    """A^T W with both axes tiled: (4*N4, L) f32 in TILE-LOCAL
    plane-major sample order."""
    d, n4 = packed.shape
    ell = w.shape[1]
    assert d % tile_d == 0 and n4 % tile_n4 == 0, (d, n4, tile_d, tile_n4)
    kernel = functools.partial(
        _left2d_packed_kernel, compute_dtype=_compute_dtype(precision)
    )
    return pl.pallas_call(
        kernel,
        grid=(n4 // tile_n4, d // tile_d),
        in_specs=[
            pl.BlockSpec((tile_d, tile_n4), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_d, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_d, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_d, ell), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4 * tile_n4, ell), lambda j, i: (j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4 * n4, ell), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * d * n4 * ell,
            bytes_accessed=d * n4 + 4 * n4 * ell * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(packed, mean, inv_std, w)


# ---------------------------------------------------------------------------
# Quantized power-iteration kernel: the int8 MXU path.
#
# The MXU multiplies s8 x s8 -> s32 at TWICE the bf16 rate (394 vs 197
# TOPS on v5e), and the genotype matrix is ALREADY small integers — the
# bf16 kernels above spend the MXU at half speed only because
# standardization turns the operands into floats.  This kernel keeps the
# contraction in int8 and hoists standardization out of the matmuls as
# exact rank-1/diagonal corrections applied to the SMALL (tile_d, L) and
# (L,) intermediates:
#
#     A = diag(s) G0 - u 1^T            (s = 1/std, u = mean/std)
#     A b       = s . (G0 b)  - u (1^T b)
#     A^T y     = G0^T (s . y) - 1 (u^T y)
#
# so one power-iteration pass T = A^T (A b) becomes two s8 MXU matmuls
# on the raw genotype tile plus O(tile_d x L) VPU work — ~16x less VPU
# traffic than dequantizing the (tile_d, N) tile, and 2x the MXU rate.
#
# Quantization: the rhs b quantizes to int8 with one global scale
# (columns of an orthonormal basis share magnitude); the intermediate
# z = s . y re-quantizes PER TILE (tighter scales than a global one).
# The int32 accumulators are EXACT for the quantized operands — the
# only error is the two 8-bit roundings, ~0.4% relative per pass, which
# subspace iteration absorbs: the driver (parallel/sharded.py) runs the
# last iterations and the Rayleigh-Ritz eigensolve through the exact
# bf16 kernels, restoring full bf16-path quality (validated |r| >=
# 0.999999 vs float64, tests/test_q8.py and VALIDATION.md).
#
# Missing genotypes: the sentinel (-127) maps to raw 0 via an int8 max,
# i.e. DURING quantized iterations a missing entry contributes -u_i
# instead of 0 — a small operator perturbation (<= 2% of entries at the
# default call-rate gate) that the exact polish iterations remove.  The
# exact kernels remain the only ones used for products that land in
# user-visible outputs (scores / loadings / eigenvalues).
# ---------------------------------------------------------------------------


def _gram_q8_kernel(g_ref, iv_ref, u_ref, bq_ref, sb_ref, csum_ref,
                    out_ref, ru_ref, *, swar_clean):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
        ru_ref[:] = jnp.zeros_like(ru_ref)

    if swar_clean:
        # {-127, 0, 1, 2} -> {0, 0, 1, 2}.  Mosaic v5e legalizes neither
        # compares nor max/shifts on int8 vectors, so clean the sentinel
        # SWAR-style through a u32 bitcast: spread each byte's sign bit
        # to a 0xFF mask and clear those bytes (~1.25 VPU ops/byte on 4x
        # fewer lanes than an int8 elementwise pass).
        x32 = pltpu.bitcast(g_ref[:], jnp.uint32)
        sign = x32 & jnp.uint32(0x80808080)
        g0 = pltpu.bitcast(x32 & ~((sign >> 7) * jnp.uint32(0xFF)), jnp.int8)
    else:  # interpret mode (CPU tests): plain max, no Mosaic bitcast
        g0 = jnp.maximum(g_ref[:], jnp.int8(0))
    # First s8 MXU pass: (tile_d, N) x (N, L) -> int32.
    w = jax.lax.dot_general(
        g0, bq_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    sb = sb_ref[0, 0]
    y = iv_ref[:] * (w.astype(jnp.float32) * sb) - u_ref[:] * csum_ref[:]
    z = iv_ref[:] * y
    # Per-tile re-quantization of z for the transpose pass.
    sz = jnp.max(jnp.abs(z)) * (1.0 / 127.0) + 1e-30
    z8 = jnp.clip(jnp.round(z * (1.0 / sz)), -127.0, 127.0).astype(jnp.int8)
    # Second s8 MXU pass, contraction over the row tile: (N, L) int32.
    t = jax.lax.dot_general(
        g0, z8, (((0,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    out_ref[:] += t.astype(jnp.float32) * sz
    ru_ref[:] += jnp.sum(u_ref[:] * y, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("tile_d", "interpret"))
def fused_gram_q8(
    geno: jax.Array,  # (D, N) int8 raw dosages (missing = -127)
    inv_std: jax.Array,  # (D, 1) f32
    u: jax.Array,  # (D, 1) f32 = mean * inv_std
    bq: jax.Array,  # (N, L) int8 quantized basis
    sb: jax.Array,  # (1, 1) f32 basis dequant scale
    csum: jax.Array,  # (1, L) f32 = column-sums of bq, pre-scaled by sb
    tile_d: int = 1024,
    interpret: bool = False,
):
    """Quantized power pass: returns (G0^T(s.y) partial (N, L) f32,
    u^T y partial (1, L) f32); the caller forms T = out - ru."""
    d, n = geno.shape
    ell = bq.shape[1]
    assert d % tile_d == 0, (d, tile_d)
    kernel = functools.partial(_gram_q8_kernel, swar_clean=not interpret)
    return pl.pallas_call(
        kernel,
        grid=(d // tile_d,),
        in_specs=[
            pl.BlockSpec((tile_d, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_d, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_d, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, ell), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ell), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n, ell), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ell), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, ell), jnp.float32),
            jax.ShapeDtypeStruct((1, ell), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * d * n * ell,
            bytes_accessed=d * n + n * ell * 8,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=interpret,
    )(geno, inv_std, u, bq, sb, csum)


def _unpack_packed_tile_s8(pk_tile, swar: bool = False):
    """(tile_d, n4) uint8 -> (tile_d, 4*n4) int8 dosages, plane-major,
    missing -> 0.

    Two paths:
    * int32 lanes (interpret/CI): one genotype per lane — plane shift,
      (4-c)>>1, select, truncating cast.
    * SWAR u32 (`swar=True`, real TPU): FOUR genotypes per lane.  The
      u8 tile bitcasts to u32 (4 codes of plane p live in the 4 bytes)
      and decodes by the bit-plane identity

          g = na + (na & nb),  na = ~a, nb = ~b

      (a = low bit, b = high bit of the 2-bit code), which maps codes
      {0, 1, 2, 3} -> {2, 0, 1, 0} exactly — dosage AND missing->0 in
      one formula, no zero-byte detect.  `~x` and the per-bit AND
      h = u & (u >> 1) are hoisted once; each plane then costs one
      shift+mask pair and a byte-safe add (addends are single bits at
      position 2p of each byte, so sums <= 2 never carry across bytes;
      h's >>1 never crosses a byte boundary for the extracted positions
      2p <= 6).  ~2.4x fewer VPU ops than the previous subtract +
      zero-detect decode (measured 15% on the full q8 power pass,
      VALIDATION.md round 5); pinned against all byte values in
      tests/test_q8.py.  The result bitcasts straight back to int8 —
      no int32->int8 relayout cast.
    """
    if swar:
        x32 = pltpu.bitcast(pk_tile, jnp.uint32)
        u32 = ~x32
        h32 = u32 & (u32 >> jnp.uint32(1))
        m = jnp.uint32(0x01010101)
        planes = []
        for p in range(4):
            g = ((u32 >> jnp.uint32(2 * p)) & m) + (
                (h32 >> jnp.uint32(2 * p)) & m
            )
            planes.append(pltpu.bitcast(g, jnp.int8))
        return jnp.concatenate(planes, axis=1)
    c = pk_tile.astype(jnp.int32)
    planes = []
    for p in range(4):
        cp = (c >> (2 * p)) & 3
        gi = (4 - cp) >> 1
        gi = jnp.where(cp != 1, gi, 0)
        planes.append(gi.astype(jnp.int8))
    return jnp.concatenate(planes, axis=1)


def _gram_q8_packed_kernel(g_ref, iv_ref, u_ref, bq_ref, sb_ref, csum_ref,
                           out_ref, ru_ref, *, swar):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
        ru_ref[:] = jnp.zeros_like(ru_ref)

    g0 = _unpack_packed_tile_s8(g_ref[:], swar=swar)
    w = jax.lax.dot_general(
        g0, bq_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    sb = sb_ref[0, 0]
    y = iv_ref[:] * (w.astype(jnp.float32) * sb) - u_ref[:] * csum_ref[:]
    z = iv_ref[:] * y
    sz = jnp.max(jnp.abs(z)) * (1.0 / 127.0) + 1e-30
    z8 = jnp.clip(jnp.round(z * (1.0 / sz)), -127.0, 127.0).astype(jnp.int8)
    t = jax.lax.dot_general(
        g0, z8, (((0,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    out_ref[:] += t.astype(jnp.float32) * sz
    ru_ref[:] += jnp.sum(u_ref[:] * y, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("tile_d", "interpret"))
def fused_gram_q8_packed(
    packed: jax.Array,  # (D, N4) uint8, PLINK 2-bit
    inv_std: jax.Array,  # (D, 1) f32
    u: jax.Array,  # (D, 1) f32 = mean * inv_std
    bq: jax.Array,  # (4*N4, L) int8 quantized basis, PLANE-MAJOR order
    sb: jax.Array,  # (1, 1) f32
    csum: jax.Array,  # (1, L) f32 column-sums of bq, pre-scaled by sb
    tile_d: int = 1024,
    interpret: bool = False,
):
    """Quantized power pass on the 2-bit layout: int8-MXU matmuls on
    in-VMEM-unpacked planes — 4x less HBM read than the dense q8 kernel
    at the same MXU rate.  Returns (partial (4*N4, L), partial (1, L));
    the caller forms T = out - ru.  Outputs ride plane-major."""
    d, n4 = packed.shape
    ell = bq.shape[1]
    assert d % tile_d == 0, (d, tile_d)
    kernel = functools.partial(_gram_q8_packed_kernel, swar=not interpret)
    return pl.pallas_call(
        kernel,
        grid=(d // tile_d,),
        in_specs=[
            pl.BlockSpec((tile_d, n4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_d, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_d, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * n4, ell), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ell), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((4 * n4, ell), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ell), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((4 * n4, ell), jnp.float32),
            jax.ShapeDtypeStruct((1, ell), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=16 * d * n4 * ell,
            bytes_accessed=d * n4 + 4 * n4 * ell * 8,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=interpret,
    )(packed, inv_std, u, bq, sb, csum)


# ---------------------------------------------------------------------------
# 2-D tiled q8 kernels (biobank sample counts on the int8 MXU).
#
# Same W = A B / T = A^T W split as the 2-D bf16 pair, but the matmuls
# stay int8: these kernels compute ONLY the raw integer products
# sum(G0 bq) and sum(G0^T z8) — the standardization corrections, the
# z re-quantization (per row tile, scales carried into the left kernel),
# and the rank-1 term run in XLA on the small (D, L) intermediate
# between the two calls (parallel/sharded.py `_q8_pass_2d`), where they
# cost a few elementwise passes over D*L*4 bytes (~4% of one
# packed-matrix read at biobank N).
# ---------------------------------------------------------------------------


def _clean_i8(g, swar: bool):
    """{-127,0,1,2} int8 -> {0,0,1,2}; SWAR on-device, max in interpret."""
    if swar:
        x32 = pltpu.bitcast(g, jnp.uint32)
        sign = x32 & jnp.uint32(0x80808080)
        return pltpu.bitcast(x32 & ~((sign >> 7) * jnp.uint32(0xFF)), jnp.int8)
    return jnp.maximum(g, jnp.int8(0))


def _right2d_q8_kernel(g_ref, b_ref, out_ref, *, packed, swar):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    g0 = (_unpack_packed_tile_s8(g_ref[:], swar=swar) if packed
          else _clean_i8(g_ref[:], swar))
    w = jax.lax.dot_general(
        g0, b_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out_ref[:] += w.astype(jnp.float32)


def _left2d_q8_kernel(g_ref, z_ref, sz_ref, out_ref, *, packed, swar):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    g0 = (_unpack_packed_tile_s8(g_ref[:], swar=swar) if packed
          else _clean_i8(g_ref[:], swar))
    t = jax.lax.dot_general(
        g0, z_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    # Per-row-tile dequant scale: the caller quantized z tile-by-tile
    # (tighter scales than one global one); apply before accumulating
    # across row tiles.  Scales ride in SMEM (a (1, 1) VMEM block is
    # not a legal Mosaic block shape) indexed by the row-tile id.
    out_ref[:] += t.astype(jnp.float32) * sz_ref[i]


@functools.partial(
    jax.jit, static_argnames=("tile_d", "tile_n", "interpret")
)
def right_apply_2d_q8(
    geno: jax.Array,  # (D, N) int8 or (D, N4) uint8 packed
    bq: jax.Array,  # (N, L) / (4*N4, L) int8 (tile-local plane-major)
    tile_d: int = 512,
    tile_n: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """sum_j G0 bq: (D, L) f32 of raw integer products."""
    packed = geno.dtype == jnp.uint8
    d, nc = geno.shape
    ell = bq.shape[1]
    assert d % tile_d == 0 and nc % tile_n == 0, (d, nc, tile_d, tile_n)
    bfac = 4 if packed else 1
    kernel = functools.partial(
        _right2d_q8_kernel, packed=packed, swar=not interpret
    )
    return pl.pallas_call(
        kernel,
        grid=(d // tile_d, nc // tile_n),
        in_specs=[
            pl.BlockSpec((tile_d, tile_n), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bfac * tile_n, ell), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_d, ell), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, ell), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bfac * d * nc * ell,
            bytes_accessed=d * nc + d * ell * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(geno, bq)


@functools.partial(
    jax.jit, static_argnames=("tile_d", "tile_n", "interpret")
)
def left_apply_2d_q8(
    geno: jax.Array,  # (D, N) int8 or (D, N4) uint8 packed
    z8: jax.Array,  # (D, L) int8, quantized per row tile of tile_d
    sz: jax.Array,  # (D/tile_d,) f32 per-row-tile dequant scales
    tile_d: int = 512,
    tile_n: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """sum_i G0^T (z8 * sz): (N, L) / (4*N4, L) f32 with the per-tile
    quantization scales applied (tile-local plane-major sample order
    when packed)."""
    packed = geno.dtype == jnp.uint8
    d, nc = geno.shape
    ell = z8.shape[1]
    assert d % tile_d == 0 and nc % tile_n == 0, (d, nc, tile_d, tile_n)
    bfac = 4 if packed else 1
    kernel = functools.partial(
        _left2d_q8_kernel, packed=packed, swar=not interpret
    )
    return pl.pallas_call(
        kernel,
        grid=(nc // tile_n, d // tile_d),
        in_specs=[
            pl.BlockSpec((tile_d, tile_n), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_d, ell), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((bfac * tile_n, ell), lambda j, i: (j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bfac * nc, ell), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bfac * d * nc * ell,
            bytes_accessed=d * nc + bfac * nc * ell * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(geno, z8, sz)


def q8_power_pass_2d(
    geno: jax.Array,  # (D, N) int8 or (D, N4) uint8 packed
    inv_std: jax.Array,  # (D, 1) f32
    u: jax.Array,  # (D, 1) f32 = mean * inv_std
    bq: jax.Array,  # (N, L) / (4*N4, L) int8 quantized basis
    sb: jax.Array,  # (1, 1) f32 basis dequant scale
    csum: jax.Array,  # (1, L) f32 column-sums of bq, pre-scaled by sb
    tile_d: int = 512,
    tile_n: int = 512,
    interpret: bool = False,
):
    """One quantized power pass on the 2-D tiled kernels.

    The biobank-N analog of `fused_gram_q8` (same argument contract):
    W = G0 bq and T = G0^T z8 run as int8-MXU pallas calls; the
    standardization corrections, the per-row-tile re-quantization of z,
    and the rank-1 term run in XLA on the small (D, L) intermediate
    between them.  Returns (G0^T(s.y) partial, u^T y partial) — the
    caller forms T = out - ru.  Sample-indexed arrays ride in the
    TILE-LOCAL plane-major order when packed.
    """
    d = geno.shape[0]
    ell = bq.shape[1]
    assert d % tile_d == 0, (d, tile_d)
    w_raw = right_apply_2d_q8(
        geno, bq, tile_d=tile_d, tile_n=tile_n, interpret=interpret
    )  # (D, L) f32 = G0 bq
    y = inv_std * (w_raw * sb[0, 0]) - u * csum  # (D, L) = A bq*sb
    z = inv_std * y
    nt = d // tile_d
    z3 = z.reshape(nt, tile_d, ell)
    sz = jnp.max(jnp.abs(z3), axis=(1, 2)) * (1.0 / 127.0) + 1e-30  # (nt,)
    z8 = jnp.clip(
        jnp.round(z3 * (1.0 / sz)[:, None, None]), -127.0, 127.0
    ).astype(jnp.int8).reshape(d, ell)
    out = left_apply_2d_q8(
        geno, z8, sz, tile_d=tile_d, tile_n=tile_n, interpret=interpret,
    )
    ru = jnp.sum(u * y, axis=0, keepdims=True)
    return out, ru

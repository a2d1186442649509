"""Packed 2-bit kernels vs the dense int8 kernels (interpret mode).

The packed kernels consume PLINK 2-bit bytes directly and emit sample-
indexed results in plane-major permuted order; with the permutation
applied they must match the int8 kernels exactly in f32 mode.
"""

import numpy as np
import pytest

from genomic_pca_tpu.ops import pallas_kernels as pk

# dosage -> PLINK code (count_A1): 2->00, missing->01, 1->10, 0->11
_DOSAGE_TO_CODE = {2: 0, -127: 1, 1: 2, 0: 3}


def pack_rows(geno: np.ndarray) -> np.ndarray:
    """(D, N) int8 dosages -> (D, ceil(N/4)) PLINK-packed uint8."""
    d, n = geno.shape
    n4 = -(-n // 4)
    codes = np.full((d, n4 * 4), 1, dtype=np.uint8)  # pad = missing (01)
    lut = np.zeros(256, dtype=np.uint8)
    for dos, code in _DOSAGE_TO_CODE.items():
        lut[dos & 0xFF] = code
    codes[:, :n] = lut[geno.view(np.uint8)]
    c = codes.reshape(d, n4, 4)
    return (
        c[:, :, 0] | (c[:, :, 1] << 2) | (c[:, :, 2] << 4) | (c[:, :, 3] << 6)
    ).astype(np.uint8)


@pytest.fixture
def data(rng):
    d, n = 64, 512  # n4 = 128 lanes
    geno = rng.integers(0, 3, size=(d, n)).astype(np.int8)
    geno[rng.random((d, n)) < 0.05] = -127
    mean = geno.astype(np.float64)
    mean = np.where(geno == -127, np.nan, mean)
    mu = np.nanmean(mean, axis=1).astype(np.float32)
    sd = np.nanstd(mean, axis=1).astype(np.float32) + 0.1
    inv = (1.0 / sd).astype(np.float32)
    b = rng.standard_normal((n, 128)).astype(np.float32)
    return geno, mu[:, None], inv[:, None], b


def test_plane_major_perm_roundtrip():
    perm = pk.plane_major_perm(512)
    assert sorted(perm.tolist()) == list(range(512))
    inv = np.argsort(perm)
    x = np.arange(512)
    assert np.array_equal(x[perm][inv], x)


def test_packed_gram_matches_int8(data):
    geno, mu, inv, b = data
    packed = pack_rows(geno)
    perm = pk.plane_major_perm(geno.shape[1])
    invp = np.argsort(perm)

    t_ref = np.asarray(pk.fused_gram_apply(
        geno, mu, inv, b, tile_d=32, precision="f32", interpret=True
    ))
    t_pk = np.asarray(pk.fused_gram_apply_packed(
        packed, mu, inv, b[perm], tile_d=32, precision="f32", interpret=True
    ))[invp]
    np.testing.assert_allclose(t_pk, t_ref, rtol=1e-2, atol=1e-3)


def test_packed_right_matches_int8(data):
    geno, mu, inv, b = data
    packed = pack_rows(geno)
    perm = pk.plane_major_perm(geno.shape[1])

    w_ref = np.asarray(pk.fused_right_apply(
        geno, mu, inv, b, tile_d=32, precision="f32", interpret=True
    ))
    w_pk = np.asarray(pk.fused_right_apply_packed(
        packed, mu, inv, b[perm], tile_d=32, precision="f32", interpret=True
    ))
    np.testing.assert_allclose(w_pk, w_ref, rtol=1e-2, atol=1e-3)


def test_packed_tsq_matches_int8(data):
    geno, mu, inv, b = data
    packed = pack_rows(geno)
    perm = pk.plane_major_perm(geno.shape[1])

    g_ref = np.asarray(pk.fused_tsq(
        geno, mu, inv, b, tile_d=32, precision="f32", interpret=True
    ))
    g_pk = np.asarray(pk.fused_tsq_packed(
        packed, mu, inv, b[perm], tile_d=32, precision="f32", interpret=True
    ))
    # (L, L) entries are O(d*n) contractions; near-zero entries carry
    # cancellation error, so the tolerance is absolute-dominated.
    np.testing.assert_allclose(g_pk, g_ref, rtol=1e-2, atol=2e-2)


def test_packed_column_padding_inert(rng):
    """Samples beyond N (pad bytes 0x55 = missing) contribute nothing."""
    d, n = 32, 500  # not a multiple of 4
    geno = rng.integers(0, 3, size=(d, n)).astype(np.int8)
    packed = pack_rows(geno)  # pads to 125 bytes (500 samples even) -> 125*4=500
    n_pad = packed.shape[1] * 4
    mu = np.full((d, 1), 0.5, np.float32)
    inv = np.full((d, 1), 1.0, np.float32)
    b = rng.standard_normal((n_pad, 128)).astype(np.float32)

    w_pk = np.asarray(pk.fused_right_apply_packed(
        packed, mu, inv, b[pk.plane_major_perm(n_pad)],
        tile_d=32, precision="f32", interpret=True,
    ))
    # int8 reference with explicit missing-padded columns
    geno_pad = np.full((d, n_pad), -127, dtype=np.int8)
    geno_pad[:, :n] = geno
    w_ref = np.asarray(pk.fused_right_apply(
        geno_pad, mu, inv, b, tile_d=32, precision="f32", interpret=True
    ))
    np.testing.assert_allclose(w_pk, w_ref, rtol=1e-2, atol=1e-3)

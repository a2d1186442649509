"""Block-parallel BGZF codec tests (io/bgzf.py + native inflater)."""

import gzip
import struct

import numpy as np
import pytest

from genomic_pca_tpu.io.bgzf import (
    BGZF_EOF,
    bgzf_decompress_parallel,
    is_bgzf_file,
    is_bgzf_header,
    open_maybe_bgzf,
    write_bgzf,
)
from genomic_pca_tpu.io.native import get_lib

needs_native = pytest.mark.skipif(
    get_lib() is None, reason="native plinkio library unavailable"
)


def test_eof_marker_is_valid_bgzf():
    assert is_bgzf_header(BGZF_EOF)
    assert gzip.decompress(BGZF_EOF) == b""


def test_writer_roundtrip_via_gzip_module(tmp_path):
    """BGZF output must be a valid multi-member gzip stream."""
    data = bytes(np.random.default_rng(0).integers(0, 256, 300_000, dtype=np.uint8))
    p = tmp_path / "x.gz"
    write_bgzf(p, data)
    assert is_bgzf_file(p)
    assert gzip.decompress(p.read_bytes()) == data


@needs_native
def test_parallel_decompress_matches_gzip(tmp_path):
    rng = np.random.default_rng(1)
    # Compressible-ish data spanning many blocks.
    data = bytes(rng.integers(0, 8, 1_000_000, dtype=np.uint8))
    p = tmp_path / "x.gz"
    write_bgzf(p, data)
    out = bgzf_decompress_parallel(p.read_bytes(), n_threads=4)
    assert out == data


@needs_native
def test_streaming_reader_small_window(tmp_path):
    """Blocks split across read windows must be carried correctly."""
    from genomic_pca_tpu.io.bgzf import _BgzfRaw
    import io

    data = b"".join(b"line %d with some padding text\n" % i for i in range(20_000))
    p = tmp_path / "x.gz"
    write_bgzf(p, data)
    # Window far smaller than one compressed block forces carries.
    fh = io.BufferedReader(_BgzfRaw(p, window_bytes=1000))
    got = fh.read()
    fh.close()
    assert got == data


@needs_native
def test_reader_line_iteration(tmp_path):
    lines = [b"header\n"] + [b"row\t%d\n" % i for i in range(5000)]
    p = tmp_path / "x.gz"
    write_bgzf(p, b"".join(lines))
    with open_maybe_bgzf(p) as fh:
        got = list(fh)
    assert got == lines


def test_plain_gzip_returns_none(tmp_path):
    p = tmp_path / "plain.gz"
    p.write_bytes(gzip.compress(b"hello world\n" * 100))
    assert not is_bgzf_file(p)
    assert open_maybe_bgzf(p) is None


@needs_native
def test_truncated_stream_raises(tmp_path):
    data = b"x" * 200_000
    p = tmp_path / "x.gz"
    write_bgzf(p, data)
    raw = p.read_bytes()
    p.write_bytes(raw[: len(raw) - 40])  # chop into the last blocks
    with pytest.raises(ValueError):
        with open_maybe_bgzf(p) as fh:
            fh.read()


@needs_native
def test_corrupt_crc_raises(tmp_path):
    data = b"y" * 100_000
    p = tmp_path / "x.gz"
    write_bgzf(p, data)
    raw = bytearray(p.read_bytes())
    # Flip a byte inside the first block's compressed payload.
    raw[30] ^= 0xFF
    with pytest.raises(ValueError):
        bgzf_decompress_parallel(bytes(raw))


@needs_native
def test_scan_reports_block_sizes(tmp_path):
    from genomic_pca_tpu.io.native import bgzf_scan_native

    data = b"z" * 200_000  # > 3 blocks of 65280
    p = tmp_path / "x.gz"
    write_bgzf(p, data)
    offsets, csizes, usizes, consumed = bgzf_scan_native(p.read_bytes())
    assert consumed == p.stat().st_size
    assert usizes.sum() == len(data)
    assert usizes[-1] == 0  # EOF marker
    assert offsets[0] == 0
    np.testing.assert_array_equal(offsets[1:], np.cumsum(csizes)[:-1])


@needs_native
def test_vcf_through_bgzf_matches_plain(tmp_path):
    """End-to-end: BGZF-compressed VCF parses identically to plain text."""
    from genomic_pca_tpu.io.vcf import process_single_vcf
    from tests.test_vcf import SAMPLES, write_vcf

    rng = np.random.default_rng(2)
    dos = rng.integers(0, 3, size=(500, len(SAMPLES)))
    plain = tmp_path / "ref.vcf"
    write_vcf(plain, dos, SAMPLES)
    bg = tmp_path / "ref2.vcf.gz"
    write_bgzf(bg, plain.read_bytes())
    blk_plain = process_single_vcf(plain, SAMPLES, 0.0)
    blk_bgzf = process_single_vcf(bg, SAMPLES, 0.0)
    assert blk_plain.ids == blk_bgzf.ids
    np.testing.assert_array_equal(blk_plain.dosages, blk_bgzf.dosages)


def test_is_bgzf_header_rejects_other_extra_subfields():
    # gzip + FEXTRA but a non-BC subfield.
    head = (
        b"\x1f\x8b\x08\x04" + b"\x00" * 4 + b"\x00\xff"
        + struct.pack("<H", 6) + b"XY" + struct.pack("<HH", 2, 123)
    )
    assert not is_bgzf_header(head + b"\x00" * 16)

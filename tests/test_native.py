"""Native C++ decode paths vs pure-Python/numpy equivalents."""

import numpy as np
import pytest

from genomic_pca_tpu.io import native as native_mod
from genomic_pca_tpu.io.bed import BedReader, write_plink
from genomic_pca_tpu.io.vcf import process_single_vcf
from tests.conftest import make_genotypes
from tests.helpers import write_vcf

pytestmark = pytest.mark.skipif(
    native_mod.get_lib() is None, reason="native library unavailable"
)


@pytest.fixture
def no_native(monkeypatch):
    """Force the pure-Python/numpy fallback paths."""
    monkeypatch.setattr(native_mod, "_lib", None)
    monkeypatch.setattr(native_mod, "_tried", True)
    yield


def test_bed_native_matches_numpy(tmp_path, rng):
    geno = make_genotypes(rng, 2048, 37, missing_rate=0.07)
    prefix = str(tmp_path / "big")
    write_plink(prefix, geno)
    reader = BedReader(prefix)
    # contiguous (native) vs per-row numpy gather via small read
    native_out = reader.read(slice(0, 2048))
    np.testing.assert_array_equal(native_out, geno)
    idx = rng.permutation(2048)[:1500]
    native_sel = reader.read(idx)
    lut_sel = np.stack([reader.read(slice(int(i), int(i) + 1))[0] for i in idx[:20]])
    np.testing.assert_array_equal(native_sel[:20], lut_sel)
    np.testing.assert_array_equal(native_sel, geno[idx])


@pytest.mark.parametrize("fmt", ["GT", "GT:DP"])
def test_vcf_native_matches_python(tmp_path, rng, monkeypatch, fmt):
    samples = [f"s{i}" for i in range(23)]
    dos = rng.integers(0, 3, size=(40, 23)).astype(np.int8)
    dos[5, 2] = -1  # missing -> whole-variant drop
    p = tmp_path / "a.vcf"
    write_vcf(p, dos, samples, fmt=fmt)

    blk_native = process_single_vcf(p, samples, 0.05)

    monkeypatch.setattr(native_mod, "_lib", None)
    monkeypatch.setattr(native_mod, "_tried", True)
    blk_py = process_single_vcf(p, samples, 0.05)

    assert blk_native.ids == blk_py.ids
    np.testing.assert_array_equal(blk_native.dosages, blk_py.dosages)


def test_vcf_native_edge_cases(tmp_path, monkeypatch):
    samples = ["a", "b", "c"]
    lines = [
        "##fileformat=VCFv4.2",
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="g">',
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ta\tb\tc",
        "22\t1\t.\tA\tC\t.\t.\t.\tGT\t0\t0/0\t0/1",  # haploid
        "22\t2\t.\tA\tC,G\t.\t.\t.\tGT\t0/1\t0/0\t0/1",  # multi-allelic
        "22\t3\t.\tA\tC\t.\t.\t.\tGT\t0/1\t1|1\t0/0",  # good, mixed phase
        "22\t4\t.\tA\tC\t.\t.\t.\tDP:GT\t3:0/1\t5:1/1\t7:0/0",  # GT 2nd
        "22\t5\t.\tA\tC\t.\t.\t.\tGT\t0/1\t0/0",  # too few samples
        "22\t6\t.\tA\tC\t.\t.\t.\tGT\t0/1\t0/0\t0/1\t1/1",  # too many
        "22\t7\t.\tA\t.\t.\t.\t.\tGT\t0/1\t0/0\t0/1",  # ALT '.'
    ]
    p = tmp_path / "e.vcf"
    p.write_text("\n".join(lines) + "\n")

    blk_native = process_single_vcf(p, samples, 0.0)
    monkeypatch.setattr(native_mod, "_lib", None)
    monkeypatch.setattr(native_mod, "_tried", True)
    blk_py = process_single_vcf(p, samples, 0.0)

    assert blk_native.ids == blk_py.ids == ["22:3:A:C", "22:4:A:C"]
    np.testing.assert_array_equal(blk_native.dosages, blk_py.dosages)


def test_vcf_parse_thread_invariance(tmp_path, rng):
    """Row-parallel parse must be bit-identical at any thread count."""
    from genomic_pca_tpu.io.native import parse_vcf_lines_native

    samples = [f"s{i}" for i in range(17)]
    dos = rng.integers(0, 3, size=(300, 17)).astype(np.int8)
    dos[rng.random((300, 17)) < 0.02] = -1  # sprinkle missing -> drops
    p = tmp_path / "t.vcf"
    write_vcf(p, dos, samples)
    body = b"".join(
        line + b"\n"
        for line in open(p, "rb").read().split(b"\n")
        if line and not line.startswith(b"#")
    )
    d1, k1, s1, n1 = parse_vcf_lines_native(body, 17, n_threads=1)
    d4, k4, s4, n4 = parse_vcf_lines_native(body, 17, n_threads=4)
    assert n1 == n4 == 300
    np.testing.assert_array_equal(k1, k4)
    np.testing.assert_array_equal(s1, s4)
    keep = k1.astype(bool)
    np.testing.assert_array_equal(d1[:n1][keep[:n1]], d4[:n4][keep[:n4]])


def test_vcf_chunk_boundary(tmp_path, rng, monkeypatch):
    """Chunked native parse must be boundary-invariant."""
    samples = [f"s{i}" for i in range(10)]
    dos = rng.integers(0, 3, size=(200, 10)).astype(np.int8)
    p = tmp_path / "c.vcf"
    write_vcf(p, dos, samples)
    ref = process_single_vcf(p, samples, 0.0)

    # Re-run the same chunked loop with a tiny (97-byte) chunk size
    # directly against the native helper; results must be identical.
    from genomic_pca_tpu.io.native import parse_vcf_lines_native

    body = b"".join(
        line + b"\n"
        for line in open(p, "rb").read().split(b"\n")
        if line and not line.startswith(b"#")
    )
    all_dos = []
    carry = b""
    pos = 0
    while pos < len(body) or carry:
        data = body[pos : pos + 97]
        pos += 97
        buf = carry + data
        if data:
            cut = buf.rfind(b"\n")
            if cut < 0:
                carry = buf
                continue
            carry = buf[cut + 1 :]
            buf = buf[: cut + 1]
        else:
            carry = b""
        if not buf:
            continue
        d, k, ls, n = parse_vcf_lines_native(buf, 10)
        all_dos.append(d[: n][k[:n].astype(bool)])
    got = np.concatenate(all_dos, axis=0)
    np.testing.assert_array_equal(got, ref.dosages)


def test_packed_qc_counts_native_matches_numpy(tmp_path, rng):
    """Native SWAR QC counts == numpy LUT fallback == device reduction,
    straight off a real .bed mmap (partial trailing byte included)."""
    from genomic_pca_tpu.io.native import packed_qc_counts_native
    from genomic_pca_tpu.ops.qc import genotype_counts_packed_host

    n_snps, n_samples = 1500, 37  # 37 % 4 != 0 -> partial byte
    g = make_genotypes(rng, n_snps, n_samples, missing_rate=0.03)
    write_plink(tmp_path / "qc", g, bp=list(range(1, n_snps + 1)))
    bed = BedReader(tmp_path / "qc")
    offs = 3 + np.arange(n_snps, dtype=np.int64) * bed._bytes_per_snp
    got = packed_qc_counts_native(bed._mmap, offs, n_samples)
    if got is None:
        pytest.skip("native lib unavailable")
    want = genotype_counts_packed_host(bed.read_packed(), n_samples)
    np.testing.assert_array_equal(got, want)
    # threading invariance
    got1 = packed_qc_counts_native(bed._mmap, offs, n_samples, n_threads=1)
    np.testing.assert_array_equal(got, got1)


def test_thread_budget_plumbing():
    from genomic_pca_tpu.io import native as nm

    try:
        nm.set_default_threads(3)
        assert nm._resolve_threads(0) == 3
        assert nm._resolve_threads(5) == 5
        nm.set_default_threads(None)
        assert nm._resolve_threads(0) >= 1
    finally:
        nm.set_default_threads(None)

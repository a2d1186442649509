"""VCF parsing semantics (parity with src/vcf.rs)."""

import numpy as np
import pytest

from genomic_pca_tpu.io.vcf import (
    discover_vcf_files,
    load_vcf_directory,
    process_single_vcf,
    read_vcf_sample_names,
)
from tests.helpers import write_vcf


SAMPLES = ["s1", "s2", "s3", "s4"]


def test_basic_parse_and_ids(tmp_path):
    dos = np.array([[0, 1, 2, 1], [2, 2, 1, 0]])
    p = tmp_path / "a.vcf"
    write_vcf(p, dos, SAMPLES, chrom="22", start_pos=500)
    blk = process_single_vcf(p, SAMPLES, maf_threshold=0.0)
    np.testing.assert_array_equal(blk.dosages, dos)
    assert blk.ids == ["22:500:A:C", "22:501:A:C"]


def test_gzip_and_plain_equal(tmp_path):
    dos = np.array([[0, 1, 2, 1]])
    write_vcf(tmp_path / "a.vcf", dos, SAMPLES)
    write_vcf(tmp_path / "b.vcf.gz", dos, SAMPLES)
    b1 = process_single_vcf(tmp_path / "a.vcf", SAMPLES, 0.0)
    b2 = process_single_vcf(tmp_path / "b.vcf.gz", SAMPLES, 0.0)
    np.testing.assert_array_equal(b1.dosages, b2.dosages)


def test_missing_gt_drops_whole_variant(tmp_path):
    dos = np.array([[0, 1, -1, 1], [1, 1, 2, 0]])
    p = tmp_path / "a.vcf"
    write_vcf(p, dos, SAMPLES)
    blk = process_single_vcf(p, SAMPLES, 0.0)
    assert blk.dosages.shape == (1, 4)
    np.testing.assert_array_equal(blk.dosages[0], dos[1])


def test_phased_separator_accepted(tmp_path):
    dos = np.array([[0, 1, 2, 1]])
    p = tmp_path / "a.vcf"
    write_vcf(p, dos, SAMPLES, phased=True)
    blk = process_single_vcf(p, SAMPLES, 0.0)
    np.testing.assert_array_equal(blk.dosages, dos)


def test_non_biallelic_skipped(tmp_path):
    p = tmp_path / "a.vcf"
    lines = [
        "##fileformat=VCFv4.2",
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="g">',
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t" + "\t".join(SAMPLES),
        "22\t1\t.\tA\tC,G\t.\t.\t.\tGT\t0/1\t0/0\t0/1\t0/0",  # multi-allelic
        "22\t2\t.\tAT\tC\t.\t.\t.\tGT\t0/1\t0/0\t0/1\t0/0",  # indel REF
        "22\t3\t.\tA\tCT\t.\t.\t.\tGT\t0/1\t0/0\t0/1\t0/0",  # indel ALT
        "22\t4\t.\tA\tC\t.\t.\t.\tGT\t0/1\t0/0\t0/1\t0/0",  # good
        "22\t5\t.\tA\t.\t.\t.\t.\tGT\t0/1\t0/0\t0/1\t0/0",  # no ALT base
    ]
    p.write_text("\n".join(lines) + "\n")
    blk = process_single_vcf(p, SAMPLES, 0.0)
    assert blk.ids == ["22:4:A:C"]


def test_haploid_and_multiallele_gt_drop(tmp_path):
    p = tmp_path / "a.vcf"
    lines = [
        "##fileformat=VCFv4.2",
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="g">',
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t" + "\t".join(SAMPLES),
        "22\t1\t.\tA\tC\t.\t.\t.\tGT\t0\t0/0\t0/1\t0/0",  # haploid -> drop
        "22\t2\t.\tA\tC\t.\t.\t.\tGT\t0/2\t0/0\t0/1\t0/0",  # allele 2 -> drop
        "22\t3\t.\tA\tC\t.\t.\t.\tGT\t0/0/1\t0/0\t0/1\t0/0",  # triploid -> drop
        "22\t4\t.\tA\tC\t.\t.\t.\tGT\t0/1\t1/1\t0/1\t0/0",  # good
    ]
    p.write_text("\n".join(lines) + "\n")
    blk = process_single_vcf(p, SAMPLES, 0.0)
    assert blk.ids == ["22:4:A:C"]
    np.testing.assert_array_equal(blk.dosages[0], [1, 2, 1, 0])


def test_format_with_extra_fields(tmp_path):
    dos = np.array([[0, 1, 2, 1]])
    p = tmp_path / "a.vcf"
    write_vcf(p, dos, SAMPLES, fmt="GT:DP")
    blk = process_single_vcf(p, SAMPLES, 0.0)
    np.testing.assert_array_equal(blk.dosages, dos)


def test_maf_filter(tmp_path):
    # freq = 1/8 = 0.125 -> maf 0.125
    dos = np.array([[1, 0, 0, 0], [1, 1, 1, 1]])  # mafs: 0.125, 0.5
    p = tmp_path / "a.vcf"
    write_vcf(p, dos, SAMPLES)
    blk = process_single_vcf(p, SAMPLES, maf_threshold=0.2)
    assert len(blk.ids) == 1
    # default threshold 0.01 when None
    blk2 = process_single_vcf(p, SAMPLES, maf_threshold=None)
    assert len(blk2.ids) == 2


def test_sample_mismatch_raises(tmp_path):
    dos = np.array([[0, 1, 2, 1]])
    p = tmp_path / "a.vcf"
    write_vcf(p, dos, SAMPLES)
    with pytest.raises(ValueError, match="Sample mismatch"):
        process_single_vcf(p, ["x1", "x2", "x3", "x4"], 0.0)


def test_header_requires_gt_format(tmp_path):
    p = tmp_path / "a.vcf"
    lines = [
        "##fileformat=VCFv4.2",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t" + "\t".join(SAMPLES),
    ]
    p.write_text("\n".join(lines) + "\n")
    with pytest.raises(ValueError, match="GT key"):
        read_vcf_sample_names(p)


def test_no_samples_header_raises(tmp_path):
    p = tmp_path / "a.vcf"
    p.write_text(
        "##fileformat=VCFv4.2\n"
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="g">\n'
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
    )
    with pytest.raises(ValueError, match="no samples"):
        read_vcf_sample_names(p)


def test_discovery_sorted_and_aggregation_order(tmp_path):
    write_vcf(tmp_path / "b.vcf", np.array([[1, 1, 0, 0]]), SAMPLES, chrom="2")
    write_vcf(tmp_path / "a.vcf", np.array([[0, 0, 1, 1]]), SAMPLES, chrom="1")
    (tmp_path / "ignore.txt").write_text("x")
    paths = discover_vcf_files(str(tmp_path))
    assert [p.name for p in paths] == ["a.vcf", "b.vcf"]
    names, ids, strips = load_vcf_directory(str(tmp_path), 0.0)
    assert names == SAMPLES
    assert ids == ["1:100:A:C", "2:100:A:C"]


def test_empty_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        discover_vcf_files(str(tmp_path))


def test_bgzf_style_multimember_gzip(tmp_path):
    """BGZF files are concatenated gzip members; parser must read all."""
    import gzip as gz

    dos = np.array([[0, 1, 2, 1], [1, 1, 0, 2], [2, 0, 1, 1]])
    plain = tmp_path / "ref.vcf"
    write_vcf(plain, dos, SAMPLES)
    raw = plain.read_bytes()
    # split into 3 separately-gzipped members (like BGZF blocks)
    cut1, cut2 = len(raw) // 3, 2 * len(raw) // 3
    multi = tmp_path / "multi.vcf.gz"
    with open(multi, "wb") as fh:
        for part in (raw[:cut1], raw[cut1:cut2], raw[cut2:]):
            fh.write(gz.compress(part))
    blk = process_single_vcf(multi, SAMPLES, 0.0)
    np.testing.assert_array_equal(blk.dosages, dos)

"""LD-block parsing and mapping semantics (prepare.rs:1424-1616)."""

import numpy as np

from genomic_pca_tpu.io.ldblocks import (
    map_snps_to_blocks,
    normalize_chromosome_name,
    parse_ld_block_file,
)


def test_normalize():
    assert normalize_chromosome_name("chr22") == "22"
    assert normalize_chromosome_name("CHR22") == "22"
    assert normalize_chromosome_name("22") == "22"
    assert normalize_chromosome_name("chrX") == "x"


def test_parse_skips_headers_and_malformed(tmp_path):
    p = tmp_path / "blocks.tsv"
    p.write_text(
        "# comment\n"
        "chr\tstart\tend\n"
        "chromosome\tstart\tend\n"
        "\n"
        "chr1 100 200\n"
        "badline\n"
        "2\t300\t400\textra\n"
    )
    blocks = parse_ld_block_file(str(p))
    assert blocks == [("1", 100, 200, "1:100-200"), ("2", 300, 400, "2:300-400")]


def test_first_containing_block_wins(tmp_path):
    p = tmp_path / "blocks.tsv"
    # overlapping blocks; SNP at 150 contained in both -> first in file order
    p.write_text("1 100 200\n1 140 300\n")
    parsed = parse_ld_block_file(str(p))
    specs, pca_orig = map_snps_to_blocks(
        ["1", "1", "1"], [150, 250, 500], [10, 20, 30], parsed
    )
    assert list(pca_orig) == [10, 20]  # SNP at 500 unblocked -> excluded
    by_tag = {s.tag: list(s.pca_snp_ids) for s in specs}
    assert by_tag == {"1:100-200": [0], "1:140-300": [1]}


def test_inclusive_bounds(tmp_path):
    p = tmp_path / "b.tsv"
    p.write_text("1 100 200\n")
    parsed = parse_ld_block_file(str(p))
    specs, pca_orig = map_snps_to_blocks(
        ["1", "1", "1", "1"], [99, 100, 200, 201], [0, 1, 2, 3], parsed
    )
    assert list(pca_orig) == [1, 2]


def test_chr_prefix_matching(tmp_path):
    p = tmp_path / "b.tsv"
    p.write_text("chr22 1 1000\n")
    parsed = parse_ld_block_file(str(p))
    specs, pca_orig = map_snps_to_blocks(["22", "chr22"], [10, 20], [0, 1], parsed)
    assert list(pca_orig) == [0, 1]


def test_blocks_sorted_by_tag_and_dense_ids(tmp_path):
    p = tmp_path / "b.tsv"
    p.write_text("2 100 200\n1 100 200\n")
    parsed = parse_ld_block_file(str(p))
    specs, pca_orig = map_snps_to_blocks(
        ["2", "1"], [150, 150], [7, 3], parsed
    )
    assert [s.tag for s in specs] == ["1:100-200", "2:100-200"]
    # dense ids sorted by original BIM index: orig 3 -> PcaSnpId 0, orig 7 -> 1
    assert list(pca_orig) == [3, 7]
    assert list(specs[0].pca_snp_ids) == [0]
    assert list(specs[1].pca_snp_ids) == [1]

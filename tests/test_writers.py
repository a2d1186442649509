"""Output writer byte-format tests (formats from src/main.rs:682-840)."""

import numpy as np

from genomic_pca_tpu.io.writers import (
    write_eigenvalues,
    write_loadings,
    write_principal_components,
)


def test_pca_tsv_format(tmp_path):
    prefix = str(tmp_path / "out" / "run1")
    scores = np.array([[1.2345678, -2.0], [0.5, 3.25]])
    write_principal_components(prefix, ["s1", "s2"], scores, suffix="eigensnp.pca.tsv")
    text = (tmp_path / "out" / "run1.eigensnp.pca.tsv").read_text()
    lines = text.splitlines()
    assert lines[0] == "SampleID\tPC1\tPC2"
    assert lines[1] == "s1\t1.234568\t-2.000000"
    assert lines[2] == "s2\t0.500000\t3.250000"


def test_vcf_suffix(tmp_path):
    prefix = str(tmp_path / "p")
    write_principal_components(prefix, ["a"], np.ones((1, 1)), suffix="vcf.pca.tsv")
    assert (tmp_path / "p.vcf.pca.tsv").exists()


def test_eigenvalues_format(tmp_path):
    prefix = str(tmp_path / "p")
    write_eigenvalues(prefix, [3.5, 1.25])
    lines = (tmp_path / "p.eigenvalues.tsv").read_text().splitlines()
    assert lines == ["PC\tEigenvalue", "1\t3.500000", "2\t1.250000"]


def test_eigenvalues_empty_header_only(tmp_path):
    # Header written even when empty (main.rs:771-776) — the VCF workflow
    # relies on this (pc_variances is empty, main.rs:676).
    prefix = str(tmp_path / "p")
    write_eigenvalues(prefix, [])
    assert (tmp_path / "p.eigenvalues.tsv").read_text() == "PC\tEigenvalue\n"


def test_loadings_format(tmp_path):
    prefix = str(tmp_path / "p")
    loadings = np.array([[0.1, -0.2], [0.3, 0.4]])
    write_loadings(prefix, ["1:100:A:C", "1:200:G:T"], ["1", "1"], [100, 200], loadings)
    lines = (tmp_path / "p.eigensnp.loadings.tsv").read_text().splitlines()
    assert lines[0] == "VariantID\tChrom\tPos\tPC1_loading\tPC2_loading"
    assert lines[1] == "1:100:A:C\t1\t100\t0.100000\t-0.200000"


def test_loadings_length_mismatch(tmp_path):
    import pytest

    with pytest.raises(ValueError, match="Mismatch"):
        write_loadings(str(tmp_path / "p"), ["a"], ["1", "2"], [1], np.ones((1, 2)))

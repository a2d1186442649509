"""End-to-end CLI tests for both workflows."""

import numpy as np
import pytest

from genomic_pca_tpu.cli import main
from genomic_pca_tpu.io.bed import write_plink
from tests.conftest import make_genotypes
from tests.helpers import write_vcf


def test_vcf_workflow_end_to_end(tmp_path, rng):
    vcf_dir = tmp_path / "vcfs"
    vcf_dir.mkdir()
    geno = make_genotypes(rng, 120, 30)
    samples = [f"s{i}" for i in range(30)]
    write_vcf(vcf_dir / "chr1.vcf", geno[:60], samples, chrom="1")
    write_vcf(vcf_dir / "chr2.vcf.gz", geno[60:], samples, chrom="2")

    out = tmp_path / "results" / "run"
    rc = main(["-d", str(vcf_dir), "-o", str(out), "-k", "4",
               "--maf", "0.05", "--rfit-seed", "11", "--log-level", "Warn"])
    assert rc == 0
    pca = (tmp_path / "results" / "run.vcf.pca.tsv").read_text().splitlines()
    assert pca[0] == "SampleID\tPC1\tPC2\tPC3\tPC4"
    assert len(pca) == 31
    assert pca[1].split("\t")[0] == "s0"
    ev = (tmp_path / "results" / "run.eigenvalues.tsv").read_text().splitlines()
    assert ev[0] == "PC\tEigenvalue"
    assert len(ev) == 5


def test_vcf_workflow_deterministic(tmp_path, rng):
    vcf_dir = tmp_path / "vcfs"
    vcf_dir.mkdir()
    geno = make_genotypes(rng, 80, 20)
    samples = [f"s{i}" for i in range(20)]
    write_vcf(vcf_dir / "a.vcf", geno, samples)
    out1, out2 = tmp_path / "r1", tmp_path / "r2"
    for out in (out1, out2):
        rc = main(["-d", str(vcf_dir), "-o", str(out), "-k", "3",
                   "--rfit-seed", "5", "--log-level", "Off"])
        assert rc == 0
    assert (tmp_path / "r1.vcf.pca.tsv").read_text() == (
        tmp_path / "r2.vcf.pca.tsv"
    ).read_text()


def test_eigensnp_workflow_end_to_end(tmp_path, rng):
    geno = make_genotypes(rng, 300, 40, missing_rate=0.01)
    prefix = str(tmp_path / "toy")
    write_plink(prefix, geno, bp=list(range(10, 3010, 10)))
    blocks = tmp_path / "blocks.tsv"
    blocks.write_text("1 1 1500\n1 1501 4000\n")

    out = tmp_path / "es"
    rc = main([
        "--eigensnp",
        "--bed-file", prefix + ".bed",
        "--ld-block-file", str(blocks),
        "-o", str(out),
        "--eigensnp-k-global", "3",
        "--eigensnp-min-subset-size", "10",
        "--eigensnp-snp-strip-size", "128",
        "--eigensnp-collect-diagnostics",
        "--log-level", "Warn",
    ])
    assert rc == 0
    pca_lines = (tmp_path / "es.eigensnp.pca.tsv").read_text().splitlines()
    assert pca_lines[0] == "SampleID\tPC1\tPC2\tPC3"
    assert len(pca_lines) == 41
    ev = (tmp_path / "es.eigenvalues.tsv").read_text().splitlines()
    assert len(ev) == 4
    loadings = (tmp_path / "es.eigensnp.loadings.tsv").read_text().splitlines()
    assert loadings[0] == "VariantID\tChrom\tPos\tPC1_loading\tPC2_loading\tPC3_loading"
    assert (tmp_path / "es.eigensnp_diagnostics.json").exists()


def test_missing_required_args():
    assert main(["-o", "x"]) == 2  # no vcf-dir/-k
    assert main(["--eigensnp", "-o", "x"]) == 2  # no bed/ld files


def test_vcf_mode_rejects_eigensnp_checkpoint_flags(tmp_path):
    # Silently ignoring either flag would drop the caller's intended
    # preemption-safety / memory bound (cli.py validation).
    base = ["-d", str(tmp_path), "-o", str(tmp_path / "o"), "-k", "3"]
    assert main(base + ["--eigensnp-stop-after-checkpoint",
                        "stage2_basis"]) == 2
    assert main(base + ["--eigensnp-checkpoint-dir",
                        str(tmp_path / "ck")]) == 2


def test_failure_returns_nonzero(tmp_path):
    rc = main(["-d", str(tmp_path), "-o", str(tmp_path / "o"), "-k", "3",
               "--log-level", "Off"])
    assert rc == 1  # empty vcf dir


def test_version_flag(capsys):
    import pytest

    with pytest.raises(SystemExit) as e:
        main(["--version"])
    assert e.value.code == 0
    assert "genomic-pca-tpu" in capsys.readouterr().out


def test_profile_dir_smoke(tmp_path, rng):
    vcf_dir = tmp_path / "vcfs"
    vcf_dir.mkdir()
    geno = make_genotypes(rng, 60, 16)
    write_vcf(vcf_dir / "a.vcf", geno, [f"s{i}" for i in range(16)])
    out = tmp_path / "p"
    rc = main(["-d", str(vcf_dir), "-o", str(out), "-k", "3",
               "--profile-dir", str(tmp_path / "prof"), "--log-level", "Off"])
    assert rc == 0
    assert (tmp_path / "prof").exists()


def test_project_rejects_fit_mode_flags(tmp_path):
    """--project combined with --eigensnp or VCF-workflow flags must
    error (not silently ignore the fit) — strict conditional-flag
    discipline matching the reference parser."""
    base = ["--project", "--bed-file", str(tmp_path / "nb"),
            "--project-loadings", str(tmp_path / "l.tsv"),
            "--project-moments", str(tmp_path / "m.tsv"),
            "-o", str(tmp_path / "out"), "--log-level", "Warn"]
    assert main(base + ["--eigensnp",
                        "--ld-block-file", str(tmp_path / "b.tsv")]) == 2
    assert main(base + ["-d", str(tmp_path)]) == 2
    assert main(base + ["-k", "4"]) == 2

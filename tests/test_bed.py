"""PLINK BED round-trip and decode tests."""

import numpy as np
import pytest

from genomic_pca_tpu.io.bed import BedReader, write_plink, read_bim, read_fam
from tests.conftest import make_genotypes


@pytest.mark.parametrize("count_a1", [True, False])
@pytest.mark.parametrize("n_samples", [1, 3, 4, 50, 63])
def test_roundtrip(tmp_path, rng, count_a1, n_samples):
    geno = make_genotypes(rng, n_snps=37, n_samples=n_samples, missing_rate=0.1)
    prefix = str(tmp_path / "toy")
    write_plink(prefix, geno, count_a1=count_a1)
    reader = BedReader(prefix)
    assert reader.n_snps == 37
    assert reader.n_samples == n_samples
    out = reader.read(count_a1=count_a1)
    np.testing.assert_array_equal(out, geno)


def test_count_a1_flip(tmp_path, rng):
    geno = make_genotypes(rng, n_snps=10, n_samples=8, missing_rate=0.2)
    prefix = str(tmp_path / "toy")
    write_plink(prefix, geno, count_a1=True)
    reader = BedReader(prefix)
    a1 = reader.read(count_a1=True)
    a2 = reader.read(count_a1=False)
    missing = a1 == -127
    np.testing.assert_array_equal(a2 == -127, missing)
    np.testing.assert_array_equal(a2[~missing], 2 - a1[~missing])


def test_snp_and_sample_subsets(tmp_path, rng):
    geno = make_genotypes(rng, n_snps=25, n_samples=17, missing_rate=0.05)
    prefix = str(tmp_path / "toy")
    write_plink(prefix, geno)
    reader = BedReader(prefix)
    snp_idx = np.array([3, 0, 24, 7])
    sample_idx = np.array([16, 2, 5])
    out = reader.read(snp_idx, sample_idx)
    np.testing.assert_array_equal(out, geno[np.ix_(snp_idx, sample_idx)])
    # contiguous slice fast path
    out2 = reader.read(slice(5, 20), sample_idx)
    np.testing.assert_array_equal(out2, geno[5:20][:, sample_idx])


def test_bim_fam_parsing(tmp_path, rng):
    geno = make_genotypes(rng, n_snps=5, n_samples=4)
    prefix = str(tmp_path / "toy")
    write_plink(
        prefix,
        geno,
        chrom=["1", "1", "2", "X", "22"],
        bp=[100, 200, 300, 400, 500],
        sid=[f"rs{i}" for i in range(5)],
        iid=["a", "b", "c", "d"],
    )
    bim = read_bim(prefix + ".bim")
    fam = read_fam(prefix + ".fam")
    assert list(bim.chrom) == ["1", "1", "2", "X", "22"]
    assert list(bim.bp) == [100, 200, 300, 400, 500]
    assert list(bim.sid) == [f"rs{i}" for i in range(5)]
    assert list(fam.iid) == ["a", "b", "c", "d"]


def test_magic_check(tmp_path):
    bad = tmp_path / "bad.bed"
    bad.write_bytes(b"xyz123")
    (tmp_path / "bad.bim").write_text("1\tsnp0\t0\t1\tA\tC\n")
    (tmp_path / "bad.fam").write_text("s\ts\t0\t0\t0\t-9\n")
    with pytest.raises(ValueError, match="not a PLINK1"):
        BedReader(str(tmp_path / "bad"))


def test_write_plink_stream_matches_batch(tmp_path, rng):
    """Streaming writer produces byte-identical .bed and equivalent
    BIM/FAM to the in-memory writer."""
    from genomic_pca_tpu.io.bed import write_plink_stream

    g = make_genotypes(rng, 1000, 37, missing_rate=0.02)
    write_plink(tmp_path / "a", g, bp=list(range(1, 1001)))
    n = write_plink_stream(
        tmp_path / "b",
        iter([g[:300], g[300:777], g[777:]]),
        37,
        bp=np.arange(1, 1001),
    )
    assert n == 1000
    assert (tmp_path / "a.bed").read_bytes() == (tmp_path / "b.bed").read_bytes()
    ra, rb = BedReader(tmp_path / "a"), BedReader(tmp_path / "b")
    np.testing.assert_array_equal(
        ra.read(slice(0, 1000), None), rb.read(slice(0, 1000), None)
    )
    np.testing.assert_array_equal(ra.bim.bp, rb.bim.bp)
    assert list(ra.fam.iid) == list(rb.fam.iid)

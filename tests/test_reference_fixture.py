"""Decode the reference repo's real PLINK fixture (binary compatibility).

The reference ships `data/chr22_subset50.{bed,fam}.zip` (a 50-sample
chr22 PLINK subset; the .bim is a missing git-LFS blob, so a positional
placeholder .bim is synthesized from the .bed geometry).  This validates
our decoder against PLINK-produced bytes rather than only our own writer.
"""

import zipfile
from pathlib import Path

import numpy as np
import pytest

REF_DATA = Path("/root/reference/data")

pytestmark = pytest.mark.skipif(
    not (REF_DATA / "chr22_subset50.bed.zip").exists(),
    reason="reference fixture unavailable",
)


@pytest.fixture
def fixture_prefix(tmp_path):
    for name in ("chr22_subset50.bed.zip", "chr22_subset50.fam.zip"):
        with zipfile.ZipFile(REF_DATA / name) as zf:
            zf.extractall(tmp_path)
    bed = next(tmp_path.glob("**/*.bed"))
    fam = next(tmp_path.glob("**/*.fam"))
    prefix = tmp_path / "chr22_subset50"
    if bed != prefix.with_suffix(".bed"):
        bed.rename(prefix.with_suffix(".bed"))
        fam.rename(prefix.with_suffix(".fam"))
    # synthesize a positional .bim matching the .bed geometry
    n_samples = sum(1 for _ in open(prefix.with_suffix(".fam")))
    bed_size = prefix.with_suffix(".bed").stat().st_size
    bytes_per_snp = (n_samples + 3) // 4
    n_snps = (bed_size - 3) // bytes_per_snp
    assert (bed_size - 3) % bytes_per_snp == 0, "bed geometry mismatch"
    with open(prefix.with_suffix(".bim"), "w") as fh:
        for i in range(n_snps):
            fh.write(f"22\tsnp{i}\t0\t{(i + 1) * 10}\tA\tC\n")
    return str(prefix)


def test_decode_real_plink_fixture(fixture_prefix):
    from genomic_pca_tpu.io.bed import BedReader

    reader = BedReader(fixture_prefix)
    assert reader.n_samples == 64
    assert reader.n_snps > 1000
    geno = reader.read(slice(0, min(reader.n_snps, 20000)))
    vals = np.unique(geno)
    assert set(vals.tolist()) <= {-127, 0, 1, 2}
    # sanity: data is polymorphic and mostly called
    assert (geno >= 0).mean() > 0.5
    assert len([v for v in vals if v >= 0]) >= 2

    # native and numpy paths agree on real PLINK bytes
    from genomic_pca_tpu.io import native as native_mod

    if native_mod.get_lib() is not None:
        sub = reader.read(np.arange(0, min(reader.n_snps, 3000)))
        per_row = np.stack(
            [reader.read(slice(i, i + 1))[0] for i in range(0, 50)]
        )
        np.testing.assert_array_equal(sub[:50], per_row)


def test_exact_pca_on_real_fixture(fixture_prefix):
    from genomic_pca_tpu.config import DataPrepConfig
    from genomic_pca_tpu.io.bed import BedReader
    from genomic_pca_tpu.models.exact import exact_pca_from_strips

    reader = BedReader(fixture_prefix)
    n_use = min(reader.n_snps, 20000)

    def strips():
        for s in range(0, n_use, 2000):
            yield reader.read(slice(s, min(s + 2000, n_use)), count_a1=False)

    cfg = DataPrepConfig(min_call_rate=0.9, min_maf=0.01, max_hwe_p=1e-6)
    res = exact_pca_from_strips(strips(), reader.n_samples, k=5, config=cfg)
    assert res.scores.shape == (64, 5)
    assert np.isfinite(res.scores).all()
    assert (res.eigenvalues > 0).all()
    assert res.n_kept_variants > 100


def test_eigensnp_concordance_on_real_fixture(fixture_prefix, tmp_path):
    """Full framework (QC -> LD blocks -> two-stage EigenSNP) vs the
    exact float64 oracle on the REAL chr22 genotypes — real LD
    structure and missingness patterns, not the synthetic generator.
    Per-PC |r| is only asserted over the eigengap-separated prefix
    (real-data spectra decay smoothly; degenerate directions rotate
    freely in both solvers)."""
    from genomic_pca_tpu.config import DataPrepConfig, EigenSnpConfig
    from genomic_pca_tpu.io.bed import BedReader
    from genomic_pca_tpu.models.eigensnp import compute_eigensnp_pca
    from genomic_pca_tpu.models.exact import exact_pca_from_strips
    from genomic_pca_tpu.models.prepare import prepare_data

    reader = BedReader(fixture_prefix)
    blocks = tmp_path / "blocks.tsv"
    span = reader.n_snps * 10 + 20
    edges = np.linspace(0, span, 5, dtype=np.int64)
    blocks.write_text(
        "".join(
            f"22 {edges[i] + 1} {edges[i + 1]}\n" for i in range(4)
        )
    )
    k = 6
    cfg = DataPrepConfig(
        bed_path=fixture_prefix,
        ld_block_path=str(blocks),
        min_call_rate=0.9,
        min_maf=0.01,
        max_hwe_p=1e-6,
    )
    prep = prepare_data(cfg)
    assert prep.n_pca_snps > 100
    res = compute_eigensnp_pca(prep, EigenSnpConfig(k_global=k))

    raw = reader.read(prep.pca_snp_orig_indices, prep.qc_sample_indices)
    exact = exact_pca_from_strips(
        iter([raw]), prep.n_samples, k=k, config=cfg, scale=True,
        apply_qc=False,
    )
    ev = np.asarray(exact.eigenvalues, dtype=np.float64)[:k]
    rel_gap = (ev[:-1] - ev[1:]) / np.maximum(ev[:-1], 1e-300)
    sep_k = k
    for j in range(k - 1):
        if rel_gap[j] < 0.05:
            sep_k = j + 1
            break
    rr = [
        abs(float(np.corrcoef(res.scores[:, j], exact.scores[:, j])[0, 1]))
        for j in range(sep_k)
    ]
    assert min(rr) > 0.999, (rr, sep_k, rel_gap.tolist())
    # rotation-invariant: the top-sep_k subspaces must agree regardless
    qf, _ = np.linalg.qr(np.asarray(res.scores[:, :sep_k], np.float64))
    qe, _ = np.linalg.qr(np.asarray(exact.scores[:, :sep_k], np.float64))
    cos = np.linalg.svd(qf.T @ qe, compute_uv=False)
    assert cos.min() > 0.999, (cos.min(), sep_k)

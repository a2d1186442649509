"""EigenSNP pipeline: prepare + two-stage algorithm end-to-end."""

import numpy as np
import pytest

from genomic_pca_tpu.config import DataPrepConfig, EigenSnpConfig
from genomic_pca_tpu.io.bed import write_plink
from genomic_pca_tpu.models.eigensnp import compute_eigensnp_pca
from genomic_pca_tpu.models.exact import exact_pca_from_strips
from genomic_pca_tpu.models.prepare import prepare_data
from tests.conftest import make_genotypes


def _setup(
    tmp_path,
    rng,
    n_snps=500,
    n_samples=80,
    missing_rate=0.01,
    n_blocks=4,
    n_pops=3,
    fst=0.1,
):
    geno = make_genotypes(
        rng, n_snps, n_samples, missing_rate=missing_rate, n_pops=n_pops, fst=fst
    )
    prefix = str(tmp_path / "toy")
    bp = np.arange(1, n_snps + 1) * 10
    write_plink(prefix, geno, bp=list(bp))
    block_file = tmp_path / "blocks.tsv"
    edges = np.linspace(0, n_snps * 10 + 10, n_blocks + 1, dtype=int)
    lines = [f"1 {edges[i]+1} {edges[i+1]}" for i in range(n_blocks)]
    block_file.write_text("\n".join(lines) + "\n")
    cfg = DataPrepConfig(
        bed_path=prefix,
        ld_block_path=str(block_file),
        min_call_rate=0.5,
        min_maf=0.01,
        max_hwe_p=1e-6,
        snp_chunk_size=200,
    )
    return geno, prefix, cfg


def test_prepare_pipeline(tmp_path, rng):
    geno, prefix, cfg = _setup(tmp_path, rng)
    prep = prepare_data(cfg)
    assert prep.n_samples == 80
    assert 0 < prep.n_pca_snps <= 500
    assert len(prep.blocks) >= 1
    # moments align with data
    raw = prep.bed.read(prep.pca_snp_orig_indices)
    valid = raw != -127
    means = np.where(valid, raw, 0).sum(1) / valid.sum(1)
    np.testing.assert_allclose(prep.mean, means.astype(np.float32), rtol=1e-5)


def test_sample_keep_file(tmp_path, rng):
    geno, prefix, cfg = _setup(tmp_path, rng)
    keep = tmp_path / "keep.txt"
    keep.write_text("sample3\nsample10\nsample42\nnot_a_sample\n")
    import dataclasses

    cfg2 = dataclasses.replace(cfg, sample_keep_path=str(keep))
    prep = prepare_data(cfg2)
    assert prep.sample_ids == ["sample3", "sample10", "sample42"]
    assert list(prep.qc_sample_indices) == [3, 10, 42]


def test_eigensnp_concordance_vs_exact(tmp_path, rng):
    geno, prefix, cfg = _setup(
        tmp_path, rng, n_snps=800, n_samples=100, n_pops=8, fst=0.25
    )
    prep = prepare_data(cfg)
    algo = EigenSnpConfig(
        k_global=5,
        components_per_block=12,
        subset_factor=1.0,
        min_subset_size=10,
        max_subset_size=100_000,
        refine_passes=2,
        seed=2025,
        snp_strip_size=200,
    )
    res = compute_eigensnp_pca(prep, algo)
    assert res.scores.shape == (100, 5)
    assert res.loadings.shape == (prep.n_pca_snps, 5)

    # exact standardized PCA restricted to the same PCA SNP set
    raw = prep.bed.read(prep.pca_snp_orig_indices)
    exact = exact_pca_from_strips(
        iter([raw]), 100, k=5, config=cfg, scale=True, apply_qc=False
    )
    for j in range(5):
        r = np.corrcoef(res.scores[:, j], exact.scores[:, j])[0, 1]
        assert abs(r) > 0.999, f"PC{j+1}: |r|={abs(r):.6f}"

    # eigenvalues: ours sigma^2/(N-1); oracle sigma^2/D
    ratio = res.eigenvalues / exact.eigenvalues
    np.testing.assert_allclose(
        ratio, prep.n_pca_snps / (100 - 1), rtol=2e-2
    )


def test_eigensnp_deterministic(tmp_path, rng):
    geno, prefix, cfg = _setup(tmp_path, rng, n_snps=300, n_samples=50)
    prep = prepare_data(cfg)
    algo = EigenSnpConfig(k_global=3, min_subset_size=10, snp_strip_size=128)
    r1 = compute_eigensnp_pca(prep, algo)
    r2 = compute_eigensnp_pca(prep, algo)
    np.testing.assert_array_equal(r1.scores, r2.scores)
    np.testing.assert_array_equal(r1.loadings, r2.loadings)


def test_subset_smaller_than_n(tmp_path, rng):
    geno, prefix, cfg = _setup(
        tmp_path, rng, n_snps=400, n_samples=60, n_pops=5, fst=0.25
    )
    prep = prepare_data(cfg)
    algo = EigenSnpConfig(
        k_global=3,
        subset_factor=0.5,
        min_subset_size=10,
        max_subset_size=30,
        refine_passes=2,
        snp_strip_size=128,
    )
    res = compute_eigensnp_pca(prep, algo)
    # refinement recovers full-sample structure despite 30-sample subset
    raw = prep.bed.read(prep.pca_snp_orig_indices)
    exact = exact_pca_from_strips(
        iter([raw]), 60, k=3, config=cfg, scale=True, apply_qc=False
    )
    for j in range(2):
        r = np.corrcoef(res.scores[:, j], exact.scores[:, j])[0, 1]
        assert abs(r) > 0.995, f"PC{j+1}: |r|={abs(r):.6f}"


def test_diagnostics_collection(tmp_path, rng):
    geno, prefix, cfg = _setup(tmp_path, rng, n_snps=200, n_samples=40)
    prep = prepare_data(cfg)
    algo = EigenSnpConfig(
        k_global=3, min_subset_size=10, collect_diagnostics=True, snp_strip_size=128
    )
    res = compute_eigensnp_pca(prep, algo)
    assert res.diagnostics is not None
    assert len(res.diagnostics["blocks"]) == len(prep.blocks)
    assert res.diagnostics["global"]["k_global"] == 3


def test_diagnostic_block_trace(tmp_path, rng):
    """--eigensnp-diagnostic-block-tag analog: the selected block's full
    stage-1 intermediates land in the diagnostics JSON and are
    numerically consistent (orthonormal basis; condensed projection ==
    basis^T @ standardized block over all samples)."""
    geno, prefix, cfg = _setup(
        tmp_path, rng, n_snps=300, n_samples=40, n_blocks=3
    )
    prep = prepare_data(cfg)
    tag = prep.blocks[1].tag
    algo = EigenSnpConfig(
        k_global=3, min_subset_size=10, snp_strip_size=128,
        diagnostic_block_tag=tag,  # implies collection
    )
    res = compute_eigensnp_pca(prep, algo)
    diag = res.diagnostics
    assert diag is not None  # tag alone enables collection
    tr = diag["block_trace"]
    assert tr["tag"] == tag and tr["block_index"] == 1
    d_b = tr["num_snps"]
    c_b = tr["num_local_components"]
    assert d_b == len(prep.blocks[1].pca_snp_ids)
    assert len(tr["subset_sample_indices"]) == algo.subset_size(
        prep.n_samples
    )
    u = np.asarray(tr["local_basis"])
    assert u.shape == (d_b, c_b)
    np.testing.assert_allclose(u.T @ u, np.eye(c_b), atol=5e-4)
    assert len(tr["local_singular_values"]) == c_b
    # Projection parity: rows of the condensed matrix for this block.
    x = prep.fetch_block_standardized(
        np.asarray(tr["pca_snp_ids"]),
        np.arange(prep.n_samples, dtype=np.int64),
    )
    np.testing.assert_allclose(
        np.asarray(tr["condensed_projection"]), u.T @ x,
        rtol=1e-3, atol=5e-3,
    )

    # Unknown tags fail fast.
    import pytest
    from genomic_pca_tpu.errors import ComputeError

    with pytest.raises(ComputeError, match="matches no LD block"):
        compute_eigensnp_pca(
            prep,
            EigenSnpConfig(k_global=3, min_subset_size=10,
                           diagnostic_block_tag="nope:0-1"),
        )


def test_diagnostics_golden_schema(tmp_path, rng):
    """The diagnostics JSON is a faithful FullPcaRunDetailedDiagnostics
    analog (main.rs:410-432): golden-file check of its structure plus
    content invariants (spectrum length, residual series, timings)."""
    import json
    from pathlib import Path

    geno, prefix, cfg = _setup(tmp_path, rng, n_snps=200, n_samples=40)
    prep = prepare_data(cfg)
    algo = EigenSnpConfig(
        k_global=3, min_subset_size=10, collect_diagnostics=True,
        snp_strip_size=128, refine_passes=2,
        diagnostic_block_tag=prep.blocks[0].tag,
    )
    diag = compute_eigensnp_pca(prep, algo).diagnostics

    def schema(x):
        if isinstance(x, dict):
            return {k: schema(v) for k, v in sorted(x.items())}
        if isinstance(x, list):
            return [schema(x[0])] if x else []
        return type(x).__name__

    golden_path = Path(__file__).parent / "golden" / "eigensnp_diagnostics_schema.json"
    golden = json.loads(golden_path.read_text())
    # Normalize int/float distinction (json round-trips both as numbers).
    got = json.loads(json.dumps(schema(diag)))
    assert got == golden, (
        f"diagnostics schema drifted:\n{json.dumps(got, indent=1)}"
    )

    # Content invariants.
    g = diag["global"]
    assert len(g["condensed_spectrum"]) == g["condensed_features"]
    assert len(g["final_eigenvalues"]) == g["k_global"]
    assert g["refine_width"] >= g["k_global"]
    assert len(diag["refinement"]["subspace_residual_per_pass"]) == 2
    assert all(0.0 <= r <= 1.0
               for r in diag["refinement"]["subspace_residual_per_pass"])
    assert set(diag["stage_seconds"]) == {
        "matrix_load", "stages_1_2", "global_pca", "refinement_finalize",
    }
    spec = g["condensed_spectrum"]
    assert all(a >= b - 1e-6 for a, b in zip(spec, spec[1:]))  # descending
    for b in diag["blocks"]:
        assert b["pca_snp_id_end"] >= b["pca_snp_id_start"] >= 0
        assert len(b["local_singular_values"]) == b["num_local_components"]


def test_no_blocks_raises(tmp_path, rng):
    geno, prefix, cfg = _setup(tmp_path, rng, n_snps=100, n_samples=30)
    empty_blocks = tmp_path / "empty.tsv"
    empty_blocks.write_text("9 1 10\n")  # wrong chromosome
    import dataclasses

    cfg2 = dataclasses.replace(cfg, ld_block_path=str(empty_blocks))
    prep = prepare_data(cfg2)
    algo = EigenSnpConfig(k_global=3)
    with pytest.raises(ValueError, match="No PCA SNPs"):
        compute_eigensnp_pca(prep, algo)


def test_device_and_host_stages_agree(tmp_path, rng):
    """The device-resident stage engine must match the host accessor path."""
    from genomic_pca_tpu.models import eigensnp as es

    geno, prefix, cfg = _setup(tmp_path, rng, n_snps=400, n_samples=64)
    prep = prepare_data(cfg)
    ecfg = EigenSnpConfig(
        k_global=4, components_per_block=3, min_subset_size=32,
        max_subset_size=48, subset_factor=0.6,
    )
    subset = es._choose_sample_subset(ecfg, prep.n_samples)
    runs = es._blocks_as_runs(prep.blocks)
    assert runs is not None  # interval blocks over sorted BIM -> runs
    a = prep.load_matrix()
    assert hasattr(a, "fetch_blocks_device")

    ub_d, sv_d, y_d = es._stages12_device(a, prep, ecfg, subset, runs, None)
    ub_h, sv_h, y_h = es._stages12_host(prep, ecfg, subset, None)
    assert len(ub_d) == len(ub_h) == len(prep.blocks)
    for i in range(len(prep.blocks)):
        np.testing.assert_allclose(ub_d[i], ub_h[i], atol=2e-4)
        np.testing.assert_allclose(sv_d[i], sv_h[i], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(y_d), np.asarray(y_h), atol=2e-3)


def test_non_contiguous_blocks_fall_back(tmp_path, rng):
    """Nested LD blocks break run-contiguity; result must still be correct."""
    from genomic_pca_tpu.models import eigensnp as es
    from genomic_pca_tpu.io.ldblocks import parse_ld_block_file

    n_snps, n_samples = 300, 48
    geno = make_genotypes(
        rng, n_snps, n_samples, missing_rate=0.0, n_pops=4, fst=0.3
    )
    prefix = str(tmp_path / "nest")
    bp = np.arange(1, n_snps + 1) * 10
    write_plink(prefix, geno, bp=list(bp))
    # Inner block listed first steals the middle of the outer block:
    # outer's SNP set has a hole -> not a contiguous PcaSnpId run.
    blocks = tmp_path / "nested.tsv"
    blocks.write_text(
        f"1 1001 1600\n"          # inner (positions 1001-1600)
        f"1 1 {n_snps * 10 + 10}\n"  # outer (everything)
    )
    cfg = DataPrepConfig(
        bed_path=prefix, ld_block_path=str(blocks),
        min_call_rate=0.0, min_maf=0.0, max_hwe_p=1.0, snp_chunk_size=100,
    )
    prep = prepare_data(cfg)
    assert es._blocks_as_runs(prep.blocks) is None
    res = compute_eigensnp_pca(
        prep, EigenSnpConfig(k_global=3, min_subset_size=n_samples)
    )
    # Subspace concordance with the exact oracle still holds through the
    # fallback (equal-FST populations make individual eigenvalues nearly
    # degenerate, so per-PC correlations are not identifiable).
    strips = [geno]
    exact = exact_pca_from_strips(iter(strips), n_samples, k=3)
    q1, _ = np.linalg.qr(res.scores)
    q2, _ = np.linalg.qr(exact.scores[:, :3])
    principal_cosines = np.linalg.svd(q1.T @ q2, compute_uv=False)
    assert principal_cosines.min() > 0.99, principal_cosines


def test_fused_qc_matrix_identical(tmp_path, rng):
    """QC->matrix fusion must produce the bit-identical sharded matrix
    (same rows, inert padding, moments) as the BED re-read path."""
    import dataclasses

    geno, prefix, cfg = _setup(tmp_path, rng, n_snps=450, n_samples=40)
    # small device batches -> several captured batches; capture requires
    # the device QC scan (the default host scan never uploads pre-QC)
    cfg = dataclasses.replace(cfg, qc_device_batch=200, qc_mode="device")

    prep_f = prepare_data(cfg)
    assert prep_f.qc_capture is not None and len(prep_f.qc_capture.batches) > 1
    sm_f = prep_f.load_matrix()
    assert prep_f.qc_capture is None  # released after assembly

    prep_r = prepare_data(dataclasses.replace(cfg, fuse_qc_matrix=False))
    assert prep_r.qc_capture is None
    sm_r = prep_r.load_matrix()

    assert sm_f.n_rows == sm_r.n_rows and sm_f.n_samples == sm_r.n_samples
    np.testing.assert_array_equal(np.asarray(sm_f.geno), np.asarray(sm_r.geno))
    np.testing.assert_array_equal(np.asarray(sm_f.mean), np.asarray(sm_r.mean))
    np.testing.assert_array_equal(
        np.asarray(sm_f.inv_std), np.asarray(sm_r.inv_std)
    )

    # QC decisions/moments are unchanged by capturing
    np.testing.assert_array_equal(
        prep_f.pca_snp_orig_indices, prep_r.pca_snp_orig_indices
    )
    np.testing.assert_array_equal(prep_f.mean, prep_r.mean)


def test_fusion_skipped_when_over_budget(tmp_path, rng, monkeypatch):
    """Capture must be disabled when the pre-QC block exceeds the HBM
    budget gate; the re-read path still produces a working matrix."""
    from genomic_pca_tpu.models import prepare as prep_mod

    import dataclasses

    geno, prefix, cfg = _setup(tmp_path, rng, n_snps=300, n_samples=32)
    cfg = dataclasses.replace(cfg, qc_mode="device")
    monkeypatch.setattr(prep_mod, "_default_device_budget", lambda: 1024)
    monkeypatch.setattr(prep_mod, "_device_memory_budget", lambda: 1024)
    prep = prepare_data(cfg)
    assert prep.qc_capture is None
    sm = prep.load_matrix()
    assert sm.n_rows == prep.n_pca_snps


def test_qc_mode_host_bitidentical_to_device(tmp_path, rng):
    """The host packed QC scan (default single-process) must reproduce
    the device scan's keep/mean/std and final matrix bit-for-bit."""
    import dataclasses

    geno, prefix, cfg = _setup(tmp_path, rng, n_snps=400, n_samples=37)
    prep_h = prepare_data(dataclasses.replace(cfg, qc_mode="host"))
    assert prep_h.qc_capture is None  # nothing uploaded during QC
    prep_d = prepare_data(dataclasses.replace(cfg, qc_mode="device"))

    np.testing.assert_array_equal(
        prep_h.pca_snp_orig_indices, prep_d.pca_snp_orig_indices
    )
    np.testing.assert_array_equal(prep_h.mean, prep_d.mean)
    np.testing.assert_array_equal(prep_h.std, prep_d.std)

    sm_h, sm_d = prep_h.load_matrix(), prep_d.load_matrix()
    np.testing.assert_array_equal(np.asarray(sm_h.geno), np.asarray(sm_d.geno))
    np.testing.assert_array_equal(
        np.asarray(sm_h.inv_std), np.asarray(sm_d.inv_std)
    )


def test_keep_list_packed_repack_matches_int8(tmp_path, rng):
    """With a sample keep-list, the default path host-QCs decoded
    columns and repacks survivors to 2-bit; decisions must equal the
    device scan's and the repacked matrix must standardize identically
    to the int8 matrix."""
    import dataclasses

    geno, prefix, cfg = _setup(tmp_path, rng, n_snps=400, n_samples=50)
    keep = tmp_path / "keep.txt"
    keep.write_text("".join(f"sample{i}\n" for i in range(0, 50, 2)))
    cfg = dataclasses.replace(cfg, sample_keep_path=str(keep))

    prep_h = prepare_data(cfg)  # auto -> host decoded-subset scan
    prep_d = prepare_data(
        dataclasses.replace(cfg, qc_mode="device", packed_pipeline=False)
    )
    np.testing.assert_array_equal(
        prep_h.pca_snp_orig_indices, prep_d.pca_snp_orig_indices
    )
    np.testing.assert_array_equal(prep_h.mean, prep_d.mean)
    np.testing.assert_array_equal(prep_h.std, prep_d.std)

    sm_h, sm_d = prep_h.load_matrix(), prep_d.load_matrix()
    assert sm_h.packed and not sm_d.packed
    # same standardized operator: A^T A B must agree (both f32 XLA on
    # CPU; only the reduction order differs between the layouts)
    import jax.numpy as jnp

    b0 = jnp.asarray(
        rng.standard_normal((prep_h.n_samples, 4)), dtype=jnp.float32
    )
    a = np.asarray(sm_h.gram_apply(b0))
    b = np.asarray(sm_d.gram_apply(b0))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-3)


def test_host_stages_packed_matches_f32_accessor(tmp_path, rng):
    """The packed block accessor (raw bytes up, standardize on device)
    must match the decoded-f32 accessor exactly; keep-lists fall back."""
    import dataclasses

    from genomic_pca_tpu.models import eigensnp as es

    geno, prefix, cfg = _setup(tmp_path, rng, n_snps=400, n_samples=64)
    prep_pk = prepare_data(cfg)
    assert prep_pk.supports_packed_blocks
    prep_f32 = prepare_data(
        dataclasses.replace(cfg, packed_pipeline=False)
    )
    assert not prep_f32.supports_packed_blocks

    ecfg = EigenSnpConfig(
        k_global=4, components_per_block=3, min_subset_size=32,
        max_subset_size=48, subset_factor=0.6,
    )
    subset = es._choose_sample_subset(ecfg, prep_pk.n_samples)
    ub_p, sv_p, y_p = es._stages12_host(prep_pk, ecfg, subset, None)
    ub_f, sv_f, y_f = es._stages12_host(prep_f32, ecfg, subset, None)
    for i in range(len(prep_pk.blocks)):
        np.testing.assert_allclose(ub_p[i], ub_f[i], atol=2e-4)
        np.testing.assert_allclose(sv_p[i], sv_f[i], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_f), atol=2e-3)

    # keep-list: packed accessor unavailable, result still correct
    keep = tmp_path / "keep2.txt"
    keep.write_text("".join(f"sample{i}\n" for i in range(0, 64, 2)))
    prep_kl = prepare_data(
        dataclasses.replace(cfg, sample_keep_path=str(keep))
    )
    assert not prep_kl.supports_packed_blocks
    res = compute_eigensnp_pca(prep_kl, ecfg)
    assert res.scores.shape == (32, 4)
    assert np.isfinite(res.scores).all()


def test_eigensnp_on_streaming_matrix_matches_resident(tmp_path, rng):
    """Bigger-than-HBM path: forcing the streaming container must give
    the same PCs as the resident run (stages 1-2 via the packed host
    accessor, refinement via streamed gram passes)."""
    geno, prefix, cfg = _setup(tmp_path, rng, n_snps=500, n_samples=60)
    prep = prepare_data(cfg)
    ecfg = EigenSnpConfig(
        k_global=4, components_per_block=4, min_subset_size=60,
        refine_passes=2,
    )
    r_resident = compute_eigensnp_pca(prep, ecfg)

    prep2 = prepare_data(cfg)
    prep2.load_matrix = lambda strip_size=2048, mesh=None: (
        prep2.load_streaming_matrix(strip_size=128)
    )
    r_stream = compute_eigensnp_pca(prep2, ecfg)

    np.testing.assert_allclose(
        r_stream.eigenvalues, r_resident.eigenvalues, rtol=1e-3
    )
    for j in range(4):
        r = np.corrcoef(r_stream.scores[:, j], r_resident.scores[:, j])[0, 1]
        assert abs(r) > 0.9999, (j, r)
        rl = np.corrcoef(r_stream.loadings[:, j], r_resident.loadings[:, j])[0, 1]
        assert abs(rl) > 0.9999, (j, rl)


def test_compile_only_seeds_without_running(tmp_path, rng):
    """compile_only AOT-compiles the program set and returns None
    without executing; outputs are not written; a subsequent real run
    at the same shape works normally."""
    from genomic_pca_tpu.workflows import run_eigensnp_workflow

    geno, prefix, cfg = _setup(tmp_path, rng, n_snps=300, n_samples=50)
    algo = EigenSnpConfig(k_global=3, min_subset_size=10, snp_strip_size=128)
    prep = prepare_data(cfg)
    assert compute_eigensnp_pca(prep, algo, compile_only=True) is None

    out = tmp_path / "co"
    run_eigensnp_workflow(cfg, algo, str(out), compile_only=True)
    assert not (tmp_path / "co.eigensnp.pca.tsv").exists()

    run_eigensnp_workflow(cfg, algo, str(out))
    assert (tmp_path / "co.eigensnp.pca.tsv").exists()

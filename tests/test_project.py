"""Device-path transform (`left_apply`) and the --project CLI.

The reference's `PCA::transform` (/root/reference/src/main.rs:659-660)
is in-process only; the framework adds a persistent-model projection
path (loadings + moments TSVs -> new-sample scores) documented in
DEVIATIONS.md §8.  These tests pin the device projection against the
host float64 path and drive the CLI end-to-end.
"""

import numpy as np

from genomic_pca_tpu.models.pca import transform, transform_device
from genomic_pca_tpu.parallel.mesh import make_mesh
from genomic_pca_tpu.parallel.sharded import ShardedMatrix, pack_int8_rows
from tests.conftest import make_genotypes


def _read_scores(path):
    """Parse a score TSV ({prefix}.*.pca.tsv) -> (N, K) float64."""
    with open(path) as fh:
        fh.readline()
        return np.asarray(
            [ln.strip().split("\t")[1:] for ln in fh], dtype=np.float64
        )


def _train_moments(g):
    valid = g != -127
    g0 = np.where(valid, g, 0).astype(np.float64)
    cnt = np.maximum(valid.sum(axis=1), 1)
    mean = g0.sum(axis=1) / cnt
    ssd = (((g0 - mean[:, None]) ** 2) * valid).sum(axis=1)
    std = np.sqrt(ssd / np.maximum(cnt - 1, 1))
    return mean.astype(np.float32), std.astype(np.float32)


def test_left_apply_matches_host(rng):
    """ShardedMatrix.left_apply == explicit standardize + matmul."""
    d, n, k = 512, 96, 5
    g = make_genotypes(rng, d, n, missing_rate=0.03)
    mean, std = _train_moments(g)
    w = rng.standard_normal((d, k)).astype(np.float32)
    sm = ShardedMatrix.from_arrays(
        iter([g]), means=[mean], stds=[std], mesh=make_mesh(), tile_d=128
    )
    got = sm.left_apply(w)
    inv = np.where(std > 0, 1.0 / np.where(std > 0, std, 1.0), 0.0)
    a = np.where(g != -127, (g.astype(np.float64) - mean[:, None])
                 * inv[:, None], 0.0)
    np.testing.assert_allclose(got, a.T @ w, rtol=2e-5, atol=2e-4)


def test_left_apply_packed_matches_dense(rng):
    d, n, k = 512, 100, 4  # 100 % 4 != 0: exercises partial-byte pad
    g = make_genotypes(rng, d, n, missing_rate=0.02)
    mean, std = _train_moments(g)
    w = rng.standard_normal((d, k)).astype(np.float32)
    mesh = make_mesh()
    sm_d = ShardedMatrix.from_arrays(
        iter([g]), means=[mean], stds=[std], mesh=mesh, tile_d=128
    )
    sm_p = ShardedMatrix.from_packed_rows(
        pack_int8_rows(g), mean, std, n, mesh=mesh, tile_d=128
    )
    np.testing.assert_allclose(
        sm_p.left_apply(w), sm_d.left_apply(w), rtol=2e-5, atol=2e-4
    )


def test_transform_device_matches_host(rng):
    """transform_device == the host f64 transform on new samples,
    including missing-genotype impute-to-training-mean."""
    d, n_new, k = 400, 33, 4
    g_train = make_genotypes(rng, d, 128, missing_rate=0.0)
    mean, std = _train_moments(g_train)
    loadings = rng.standard_normal((d, k)).astype(np.float32)
    g_new = make_genotypes(rng, d, n_new, missing_rate=0.05)
    host = transform(g_new, loadings, mean, std)
    dev = transform_device(g_new, loadings, mean, std)
    np.testing.assert_allclose(dev, host, rtol=2e-5, atol=2e-4)
    # center-only convention (std=None)
    host_c = transform(g_new, loadings, mean, None)
    dev_c = transform_device(g_new, loadings, mean, None)
    np.testing.assert_allclose(dev_c, host_c, rtol=2e-5, atol=2e-3)


def test_project_cli_end_to_end(rng, tmp_path):
    """Fit with --write-moments, then --project NEW samples; scores of
    the training samples projected through their own model must match
    the fit's scores (self-projection identity of exact PC scores)."""
    import subprocess
    import sys

    from genomic_pca_tpu.io.bed import write_plink

    d, n, k = 1024, 96, 4
    g = make_genotypes(rng, d, n, missing_rate=0.0, n_pops=4, fst=0.2)
    write_plink(str(tmp_path / "train"), g,
                bp=list(range(10, d * 10 + 10, 10)))
    with open(tmp_path / "blocks.tsv", "w") as fh:
        edges = np.linspace(0, d * 10 + 20, 5, dtype=np.int64)
        for i in range(4):
            fh.write(f"1 {edges[i] + 1} {edges[i + 1]}\n")

    env_cmd = [sys.executable, "-m", "genomic_pca_tpu"]
    fit = subprocess.run(
        env_cmd + [
            "--eigensnp", "--bed-file", str(tmp_path / "train"),
            "--ld-block-file", str(tmp_path / "blocks.tsv"),
            "-o", str(tmp_path / "fit"),
            "--eigensnp-k-global", str(k),
            "--eigensnp-min-subset-size", str(n),
            "--eigensnp-min-maf", "0.0",
            "--eigensnp-max-hwe-p", "1.0",
            "--write-moments", "--log-level", "Warn",
        ],
        capture_output=True, text=True, timeout=420,
    )
    assert fit.returncode == 0, fit.stderr[-2000:]
    assert (tmp_path / "fit.eigensnp.moments.tsv").exists()

    proj = subprocess.run(
        env_cmd + [
            "--project", "--bed-file", str(tmp_path / "train"),
            "--project-loadings", str(tmp_path / "fit.eigensnp.loadings.tsv"),
            "--project-moments", str(tmp_path / "fit.eigensnp.moments.tsv"),
            "-o", str(tmp_path / "proj"), "--log-level", "Warn",
        ],
        capture_output=True, text=True, timeout=420,
    )
    assert proj.returncode == 0, proj.stderr[-2000:]

    s_fit = _read_scores(tmp_path / "fit.eigensnp.pca.tsv")
    s_proj = _read_scores(tmp_path / "proj.projected.pca.tsv")
    assert s_proj.shape == (n, k)
    # Self-projection: X_std @ L = scores up to the rSVD approximation
    # and the 6-dp loadings round-trip -> per-PC |r| ~ 1.
    for i in range(k):
        r = abs(np.corrcoef(s_fit[:, i], s_proj[:, i])[0, 1])
        assert r > 0.999, (i, r)


def test_projection_chunked_matches_single_strip(rng, tmp_path):
    """Strip-chunked projection (linearity over SNP rows) is identical
    to the one-shot projection."""
    from genomic_pca_tpu.io.bed import write_plink
    from genomic_pca_tpu.io.writers import write_loadings, write_moments
    from genomic_pca_tpu.workflows import run_projection_workflow

    d, n, k = 700, 48, 3
    g = make_genotypes(rng, d, n, missing_rate=0.02)
    write_plink(str(tmp_path / "nb"), g, bp=list(range(10, d * 10 + 10, 10)))
    mean, std = _train_moments(g)
    loadings = rng.standard_normal((d, k)).astype(np.float32)
    sids = [f"snp{i}" for i in range(d)]
    write_loadings(
        str(tmp_path / "m"), sids, ["1"] * d, list(range(10, d * 10 + 10, 10)),
        loadings,
    )
    write_moments(str(tmp_path / "m"), sids, mean, std,
                  ["A"] * d, ["C"] * d)

    run_projection_workflow(
        str(tmp_path / "nb"),
        str(tmp_path / "m.eigensnp.loadings.tsv"),
        str(tmp_path / "m.eigensnp.moments.tsv"),
        str(tmp_path / "one"),
    )
    run_projection_workflow(
        str(tmp_path / "nb"),
        str(tmp_path / "m.eigensnp.loadings.tsv"),
        str(tmp_path / "m.eigensnp.moments.tsv"),
        str(tmp_path / "chk"),
        projection_strip_rows=256,  # 3 uneven strips
    )

    one = _read_scores(tmp_path / "one.projected.pca.tsv")
    chk = _read_scores(tmp_path / "chk.projected.pca.tsv")
    np.testing.assert_allclose(chk, one, rtol=1e-4, atol=5e-4)


def test_transform_zero_std_convention(rng):
    """SNPs with std == 0 contribute ZERO on BOTH transform paths (the
    inert-row convention of the fit path); previously the host path
    kept the centered contribution while the device path zeroed it."""
    d, n_new, k = 256, 16, 3
    g_new = make_genotypes(rng, d, n_new, missing_rate=0.02)
    mean = rng.uniform(0.2, 1.8, d).astype(np.float32)
    std = rng.uniform(0.3, 1.0, d).astype(np.float32)
    std[::7] = 0.0  # monomorphic-in-training SNPs
    loadings = rng.standard_normal((d, k)).astype(np.float32)

    host = transform(g_new, loadings, mean, std)
    dev = transform_device(g_new, loadings, mean, std)
    np.testing.assert_allclose(dev, host, rtol=2e-5, atol=2e-4)

    # The zero-std rows must actually be inert: zeroing their loadings
    # changes nothing.
    l2 = loadings.copy()
    l2[::7] = 0.0
    np.testing.assert_allclose(transform(g_new, l2, mean, std), host,
                               rtol=0, atol=0)


def test_strip_projector_matches_transform_device(rng):
    """StripProjector (one compiled program, inert-row tail padding)
    reproduces transform_device strip-by-strip."""
    from genomic_pca_tpu.models.pca import StripProjector

    d, n_new, k, strip = 700, 24, 4, 256
    g_train = make_genotypes(rng, d, 64, missing_rate=0.0)
    mean, std = _train_moments(g_train)
    std[5] = 0.0
    g_new = make_genotypes(rng, d, n_new, missing_rate=0.04)
    loadings = rng.standard_normal((d, k)).astype(np.float32)

    whole = transform(g_new, loadings, mean, std)
    project = StripProjector(strip, n_new, k)
    acc = np.zeros((n_new, k), dtype=np.float32)
    for lo in range(0, d, strip):
        hi = min(lo + strip, d)
        acc += project(g_new[lo:hi], loadings[lo:hi], mean[lo:hi],
                       std[lo:hi])
    np.testing.assert_allclose(acc, whole, rtol=2e-5, atol=5e-4)
    # center-only convention
    whole_c = transform(g_new, loadings, mean, None)
    pc = StripProjector(strip, n_new, k)
    acc_c = np.zeros((n_new, k), dtype=np.float32)
    for lo in range(0, d, strip):
        hi = min(lo + strip, d)
        acc_c += pc(g_new[lo:hi], loadings[lo:hi], mean[lo:hi], None)
    np.testing.assert_allclose(acc_c, whole_c, rtol=2e-5, atol=2e-3)

"""Evaluation harness tests: metrics, plots, sweeps, exact CLI, disk bench."""

import json
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from tests.conftest import make_genotypes


def _fake_population_data(rng, n_per_subpop=30):
    """Synthetic PC scores with clear subpopulation structure + labels."""
    subpops = {
        "EUR": ["GBR", "FIN", "TSI"],
        "AFR": ["YRI", "LWK"],
    }
    rows_scores = []
    rows_samples = []
    i = 0
    for spop, subs in subpops.items():
        for si, sub in enumerate(subs):
            center = rng.normal(0, 5, size=4)
            for _ in range(n_per_subpop):
                sid = f"HG{i:05d}"
                pcs = center + rng.normal(0, 0.4, size=4)
                rows_scores.append([sid] + list(pcs))
                rows_samples.append([sid, sub, spop])
                i += 1
    scores = pd.DataFrame(
        rows_scores, columns=["SampleID", "PC1", "PC2", "PC3", "PC4"]
    )
    samples = pd.DataFrame(
        rows_samples,
        columns=["Sample name", "Population code", "Superpopulation code"],
    )
    return scores, samples


@pytest.fixture
def pop_files(tmp_path, rng):
    scores, samples = _fake_population_data(rng)
    pca_path = tmp_path / "toy.eigensnp.pca.tsv"
    sample_path = tmp_path / "igsr_samples.tsv"
    scores.to_csv(pca_path, sep="\t", index=False)
    samples.to_csv(sample_path, sep="\t", index=False)
    return str(pca_path), str(sample_path)


def test_metrics_end_to_end(tmp_path, pop_files):
    from genomic_pca_tpu.eval.metrics import main

    pca_path, sample_path = pop_files
    out = tmp_path / "metrics.tsv"
    rc = main([
        "--pca_file", pca_path,
        "--sample_file", sample_path,
        "--number_of_pcs", "4",
        "--mc_samples", "400",
        "--output_tsv", str(out),
    ])
    assert rc == 0
    df = pd.read_csv(out, sep="\t")
    assert set(df["Superpopulation"]) == {"EUR", "AFR"}
    eur = df[df["Superpopulation"] == "EUR"].iloc[0]
    # Well-separated synthetic clusters: classifier should be near-perfect
    assert eur["LogReg_Balanced_Accuracy_CV"] > 0.9
    assert eur["Average_silhouette"] > 0.5
    assert eur["HDBSCAN_adjusted_mutual_information"] > 0.8
    assert eur["Mean_multivariate_Jensen_Shannon_divergence_nats"] > 0.1


def test_metrics_jsd_properties(rng):
    from genomic_pca_tpu.eval.metrics import _fit_kdes, monte_carlo_jsd

    x = rng.normal(0, 1, size=(200, 3))
    labels = np.array(["a"] * 100 + ["b"] * 100)
    kdes, _ = _fit_kdes(x, labels)
    same = monte_carlo_jsd(kdes["a"], kdes["a"], 500)
    assert abs(same) < 1e-6  # identical KDEs -> 0 divergence
    x2 = np.vstack([rng.normal(0, 1, (100, 3)), rng.normal(8, 1, (100, 3))])
    kdes2, _ = _fit_kdes(x2, labels)
    apart = monte_carlo_jsd(kdes2["a"], kdes2["b"], 500)
    assert apart > 0.5  # well-separated -> near ln 2


def test_plot_harness(tmp_path, pop_files, rng):
    from genomic_pca_tpu.eval.plot import main

    pca_path, sample_path = pop_files
    # eigenvalues + loadings alongside
    pd.DataFrame(
        {"PC": [1, 2, 3, 4], "Eigenvalue": [4.0, 2.0, 1.0, 0.5]}
    ).to_csv(Path(pca_path).parent / "toy.eigenvalues.tsv", sep="\t", index=False)
    pd.DataFrame(
        {
            "VariantID": [f"v{i}" for i in range(50)],
            "Chrom": ["1"] * 50,
            "Pos": np.arange(50) * 100,
            "PC1_loading": rng.normal(size=50),
            "PC2_loading": rng.normal(size=50),
        }
    ).to_csv(
        Path(pca_path).parent / "toy.eigensnp.loadings.tsv", sep="\t", index=False
    )
    rc = main([
        "--results-dir", str(Path(pca_path).parent),
        "--sample-file", sample_path,
    ])
    assert rc == 0
    parent = Path(pca_path).parent
    assert (parent / "scree.png").exists()
    assert (parent / "pca.png").exists()
    assert (parent / "loadings.png").exists()


def test_sweep_config_generation(tmp_path):
    from genomic_pca_tpu.eval.sweep_run import generate_run_configs

    configs = generate_run_configs(tmp_path, threads=2)
    assert configs[0]["swept_param_name"] == "N/A (Base Defaults)"
    names = {c["swept_param_name"] for c in configs[1:]}
    assert "eigensnp_min_maf" in names
    assert "eigensnp_refine_passes" in names
    ids = [c["run_id"] for c in configs]
    assert len(ids) == len(set(ids))
    # swept value actually differs from default in each config
    for c in configs[1:]:
        from genomic_pca_tpu.eval.sweep_run import default_params

        assert c[c["swept_param_name"]] == c["swept_param_value"]


def test_sweep_run_and_analyze_end_to_end(tmp_path, rng, pop_files):
    from genomic_pca_tpu.eval.sweep_run import (
        build_command,
        execute_single_run,
    )
    from genomic_pca_tpu.eval import sweep_analyze
    from genomic_pca_tpu.io.bed import write_plink

    _, sample_path = pop_files
    # toy BED whose FAM ids match the sample table
    samples_df = pd.read_csv(sample_path, sep="\t")
    iids = list(samples_df["Sample name"])
    geno = make_genotypes(rng, 200, len(iids), n_pops=3, fst=0.3)
    prefix = str(tmp_path / "toy")
    write_plink(prefix, geno, bp=list(range(10, 2010, 10)), iid=iids)
    blocks = tmp_path / "blocks.tsv"
    blocks.write_text("1 1 3000\n")

    sweep_dir = tmp_path / "sweeps"
    sweep_dir.mkdir()
    cfgs = []
    from genomic_pca_tpu.eval.sweep_run import default_params

    for i, k in enumerate([4, 6]):
        cfg = default_params(threads=1)
        cfg.update(
            eigensnp_k_global=4,
            eigensnp_components_per_block=k,
            eigensnp_min_subset_size=5,
            eigensnp_snp_strip_size=128,
            run_id=f"run_{i:03d}_components_per_block_{k}",
            swept_param_name="eigensnp_components_per_block",
            swept_param_value=k,
            output_dir=str(sweep_dir / f"run_{i:03d}"),
            output_prefix=str(sweep_dir / f"run_{i:03d}" / "res"),
        )
        cfgs.append(cfg)

    with open(sweep_dir / "sweeps_summary.tsv", "w") as fh:
        fh.write(
            "run_id\tswept_param_name\tswept_param_value\t"
            "duration_seconds\tsuccess\tcommand\n"
        )
        for cfg in cfgs:
            res = execute_single_run((cfg, prefix + ".bed", str(blocks)))
            assert res["success"], (sweep_dir / f"{cfg['run_id']}").exists()
            fh.write(
                f"{res['run_id']}\t{res['swept_param_name']}\t"
                f"{res['swept_param_value']}\t{res['duration_seconds']}\t"
                f"{res['success']}\t{res['command']}\n"
            )

    # fix run dirs to match run_id naming used by analyze
    for i, cfg in enumerate(cfgs):
        (sweep_dir / f"run_{i:03d}").rename(sweep_dir / cfg["run_id"])

    merged = sweep_analyze.analyze(
        str(sweep_dir), sample_path, number_of_pcs=4, jobs=1, make_plots=True
    )
    assert len(merged) == 2
    assert "LogReg_Balanced_Accuracy_CV" in merged.columns
    assert merged["LogReg_Balanced_Accuracy_CV"].notna().any()
    # cache files created
    assert list(sweep_dir.glob("*/*.metrics_cache.tsv"))


def test_exact_cli(tmp_path, rng):
    from genomic_pca_tpu.eval.exact import main
    from genomic_pca_tpu.io.bed import write_plink

    geno = make_genotypes(rng, 300, 30)
    prefix = str(tmp_path / "toy")
    write_plink(prefix, geno)
    out_dir = tmp_path / "res"
    rc = main([
        "--bed-prefix", prefix,
        "--out-dir", str(out_dir),
        "--k-components", "5",
        "--variant-chunk", "128",
    ])
    assert rc == 0
    pca = pd.read_csv(out_dir / "pca.tsv", sep="\t")
    assert "SampleID" in pca.columns and "PC1" in pca.columns
    assert len(pca) == 30
    ev = pd.read_csv(out_dir / "py.eigenvalues.tsv", sep="\t")
    assert list(ev.columns) == ["PC", "Eigenvalue"]


def test_diskbench(tmp_path, rng, capsys):
    from genomic_pca_tpu.eval.diskbench import main
    from genomic_pca_tpu.io.bed import write_plink

    geno = make_genotypes(rng, 2000, 40)
    prefix = str(tmp_path / "toy")
    write_plink(prefix, geno)
    rc = main(["--bed-prefix", prefix, "--time-cap", "0.5", "--strip-size", "256"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["sequential_strips_genotypes_per_sec"] > 0
    assert out["parallel_blocks_genotypes_per_sec"] > 0

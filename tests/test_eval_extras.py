"""subset merger and sweep animation tests."""

from pathlib import Path

import numpy as np
import pandas as pd

from tests.conftest import make_genotypes


def test_subset_merge_sort(tmp_path):
    from genomic_pca_tpu.eval.subset import create_combined_subset_tsv

    a = tmp_path / "a.tsv"
    b = tmp_path / "b.tsv"
    a.write_text("chrom\tpos\n2\t500\n1\t100\nX\t50\nMT\t1\n")
    b.write_text("1\t100\n1\t50\n10\t7\nchr2\t400\n")
    out = tmp_path / "out.tsv"
    n = create_combined_subset_tsv([str(a), str(b)], str(out))
    lines = out.read_text().splitlines()
    assert n == len(lines)
    # chromosome order parity: numeric 1..22, X, Y, MT, XY
    # (/root/reference/data/subset.py:23-31: x -> 2, y -> 3, mt/m -> 4, xy -> 5)
    chroms = [l.split("\t")[0].upper().replace("CHR", "") for l in lines]
    order = {**{str(i): i for i in range(1, 23)}, "X": 23, "Y": 24, "MT": 25, "XY": 26}
    keys = [order.get(c, 99) for c in chroms]
    assert keys == sorted(keys)


def test_subset_full_chrom_order_parity(tmp_path):
    """Full-order parity with /root/reference/data/subset.py:23-31.

    MT sorts BEFORE XY (mt -> group 4, xy -> group 5 in the reference key),
    after the numeric chromosomes, X, and Y.
    """
    from genomic_pca_tpu.eval.subset import chrom_sort_key, create_combined_subset_tsv

    a = tmp_path / "mixed.tsv"
    # Deliberately scrambled, with both M/MT spellings and chr prefixes.
    a.write_text(
        "XY\t10\nMT\t5\nchrY\t3\nX\t7\n22\t1\nchr1\t9\nM\t2\n10\t4\n2\t8\n"
    )
    out = tmp_path / "out.tsv"
    create_combined_subset_tsv([str(a)], str(out))
    chroms = [
        l.split("\t")[0].upper().replace("CHR", "")
        for l in out.read_text().splitlines()
    ]
    assert chroms == ["1", "2", "10", "22", "X", "Y", "M", "MT", "XY"]
    # Key-level assertions of the reference grouping.
    assert chrom_sort_key("MT")[0] < chrom_sort_key("XY")[0]
    assert chrom_sort_key("M")[0] == chrom_sort_key("MT")[0]
    assert chrom_sort_key("Y")[0] < chrom_sort_key("MT")[0]


def test_video_gif_generation(tmp_path, rng):
    from genomic_pca_tpu.eval.video import assemble_animation
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    frames = []
    for i in range(3):
        fig, ax = plt.subplots(figsize=(2, 2))
        ax.plot([0, 1], [0, i])
        f = tmp_path / f"frame{i}.png"
        fig.savefig(f)
        plt.close(fig)
        frames.append(f)
    out = assemble_animation(frames, tmp_path / "anim", fps=2)
    assert out is not None and out.exists()
    assert out.suffix in (".mp4", ".gif")


def test_video_frame_generation(tmp_path, rng):
    from genomic_pca_tpu.eval.video import generate_single_frame

    # Build a run dir with a pca.tsv + sample table
    subpops = [("GBR", "EUR"), ("YRI", "AFR")]
    rows_s, rows_p = [], []
    for i in range(40):
        sub, spop = subpops[i % 2]
        sid = f"S{i}"
        rows_p.append([sid, rng.normal(), rng.normal()])
        rows_s.append([sid, sub, spop])
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    pd.DataFrame(rows_p, columns=["SampleID", "PC1", "PC2"]).to_csv(
        run_dir / "res.eigensnp.pca.tsv", sep="\t", index=False
    )
    sample_file = tmp_path / "samples.tsv"
    pd.DataFrame(
        rows_s, columns=["Sample name", "Population code", "Superpopulation code"]
    ).to_csv(sample_file, sep="\t", index=False)

    frame = run_dir / "frame.png"
    assert generate_single_frame(run_dir, str(sample_file), frame)
    assert frame.exists()

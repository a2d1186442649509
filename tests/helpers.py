"""Test helpers: synthetic VCF writing."""

import gzip
from pathlib import Path

import numpy as np


def write_vcf(
    path,
    dosages: np.ndarray,
    sample_names,
    chrom="22",
    start_pos=100,
    ref="A",
    alt="C",
    fmt="GT",
    extra_lines=(),
    phased=False,
):
    """Write (n_variants, n_samples) dosages (0/1/2, -1 = missing GT './.')."""
    path = Path(path)
    sep = "|" if phased else "/"
    gt_of = {0: f"0{sep}0", 1: f"0{sep}1", 2: f"1{sep}1", -1: f".{sep}."}
    lines = ["##fileformat=VCFv4.2",
             '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">']
    if ":" in fmt:
        lines.append('##FORMAT=<ID=DP,Number=1,Type=Integer,Description="Depth">')
    lines.extend(extra_lines)
    lines.append("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
                 + "\t".join(sample_names))
    for i, row in enumerate(np.asarray(dosages)):
        fields = []
        for d in row:
            gt = gt_of[int(d)]
            if fmt == "GT":
                fields.append(gt)
            else:
                fields.append(f"{gt}:30")
        lines.append(
            f"{chrom}\t{start_pos + i}\t.\t{ref}\t{alt}\t.\tPASS\t.\t{fmt}\t"
            + "\t".join(fields)
        )
    data = ("\n".join(lines) + "\n").encode()
    if str(path).endswith(".gz"):
        with gzip.open(path, "wb") as fh:
            fh.write(data)
    else:
        path.write_bytes(data)

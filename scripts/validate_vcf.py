"""End-to-end VCF-workflow validation on the attached accelerator.

Synthesizes a chr22-chunk-class VCF (driver benchmark config 1:
vcf, k=10, MAF 0.05, fixed rfit seed), runs the full VCF workflow
(parse -> dosage strips -> randomized PCA -> TSVs), and checks score
concordance against the float64 center-only exact oracle on the same
post-filter matrix.

Prints one JSON summary line.
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from genomic_pca_tpu.config import DataPrepConfig  # noqa: E402
from genomic_pca_tpu.io.vcf import load_vcf_directory  # noqa: E402
from genomic_pca_tpu.models.exact import exact_pca_from_strips  # noqa: E402
from genomic_pca_tpu.workflows import run_vcf_workflow  # noqa: E402

log = logging.getLogger("validate_vcf")

GT = np.array([b"0/0", b"0/1", b"1/1"], dtype=object)


def write_big_vcf(path: Path, dosages: np.ndarray, samples) -> None:
    with open(path, "wb") as fh:
        fh.write(b"##fileformat=VCFv4.2\n")
        fh.write(b'##FORMAT=<ID=GT,Number=1,Type=String,Description="G">\n')
        fh.write(
            b"#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
            + "\t".join(samples).encode()
            + b"\n"
        )
        for i, row in enumerate(dosages):
            fields = GT[row]
            fh.write(
                f"22\t{16050000 + i}\t.\tA\tC\t.\tPASS\t.\tGT\t".encode()
                + b"\t".join(fields)
                + b"\n"
            )


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--variants", type=int, default=50_000)
    p.add_argument("--samples", type=int, default=1000)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--maf", type=float, default=0.05)
    args = p.parse_args()
    logging.basicConfig(
        level=logging.INFO, format="[%(asctime)s %(levelname)s] %(message)s"
    )
    from genomic_pca_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    import jax

    platform = jax.devices()[0].platform

    rng = np.random.default_rng(11)
    n_pops = 5
    ancestral = rng.uniform(0.08, 0.92, size=args.variants)
    fst = 0.15
    a = ancestral * (1 - fst) / fst
    b = (1 - ancestral) * (1 - fst) / fst
    pop_freqs = rng.beta(a[:, None], b[:, None], size=(args.variants, n_pops))
    pop_of = rng.integers(0, n_pops, size=args.samples)
    freqs = pop_freqs[:, pop_of]
    dosages = (
        (rng.random(freqs.shape) < freqs).astype(np.int8)
        + (rng.random(freqs.shape) < freqs).astype(np.int8)
    )

    workdir = Path(tempfile.mkdtemp(prefix="gptpu_vcf_"))
    vcf_dir = workdir / "vcfs"
    vcf_dir.mkdir()
    samples = [f"HG{i:05d}" for i in range(args.samples)]
    t0 = time.time()
    half = args.variants // 2
    write_big_vcf(vcf_dir / "chr22_a.vcf", dosages[:half], samples)
    write_big_vcf(vcf_dir / "chr22_b.vcf", dosages[half:], samples)
    write_time = time.time() - t0
    size_mb = sum(f.stat().st_size for f in vcf_dir.iterdir()) / 1e6
    log.info("Wrote %.0f MB of VCF in %.1fs.", size_mb, write_time)

    out_prefix = str(workdir / "run")
    t0 = time.time()
    run_vcf_workflow(
        vcf_dir=str(vcf_dir),
        output_prefix=out_prefix,
        k=args.k,
        maf=args.maf,
        rfit_seed=42,
    )
    wf_time = time.time() - t0

    # parse scores back
    lines = Path(out_prefix + ".vcf.pca.tsv").read_text().splitlines()
    scores = np.array(
        [[float(v) for v in line.split("\t")[1:]] for line in lines[1:]]
    )

    # center-only exact oracle on the same MAF-filtered matrix
    t0 = time.time()
    _, ids, strips = load_vcf_directory(str(vcf_dir), args.maf)
    kept = np.concatenate(list(strips), axis=0)
    cfg = DataPrepConfig(min_call_rate=0.0, min_maf=0.0, max_hwe_p=1.0)
    exact = exact_pca_from_strips(
        iter([kept]), args.samples, k=args.k, config=cfg, scale=False
    )
    oracle_time = time.time() - t0

    k_eff = min(scores.shape[1], exact.scores.shape[1])
    scores_ours = scores
    rs = [
        abs(float(np.corrcoef(scores[:, j], exact.scores[:, j])[0, 1]))
        for j in range(k_eff)
    ]
    ev = exact.eigenvalues
    separated = [
        j
        for j in range(k_eff)
        if min(
            (ev[j] - ev[j + 1]) / ev[j] if j + 1 < len(ev) else 1.0,
            (ev[j - 1] - ev[j]) / ev[j] if j > 0 else 1.0,
        )
        > 0.02
    ]
    min_r = min((rs[j] for j in separated), default=1.0)

    # Subspace concordance of the leading "structure block": individual
    # PCs inside a cluster of near-equal eigenvalues may rotate, but the
    # span they carry must match.  The block ends at the largest
    # eigenvalue cliff within k.
    ratios = [ev[j] / ev[j + 1] for j in range(min(k_eff, len(ev) - 1))]
    m = int(np.argmax(ratios)) + 1 if ratios else k_eff
    q_ours, _ = np.linalg.qr(scores_ours[:, :m])
    q_ref, _ = np.linalg.qr(exact.scores[:, :m])
    subspace_min_cos = float(np.linalg.svd(q_ours.T @ q_ref, compute_uv=False).min())
    log.info("Per-PC |r|: %s (separated: %s)", [f"{r:.6f}" for r in rs],
             [j + 1 for j in separated])

    summary = {
        "platform": platform,
        "n_variants": args.variants,
        "n_kept_variants": int(kept.shape[0]),
        "n_samples": args.samples,
        "vcf_mb": round(size_mb, 1),
        "workflow_seconds": round(wf_time, 2),
        "oracle_seconds": round(oracle_time, 2),
        "variants_per_sec_end_to_end": round(args.variants / wf_time, 1),
        "min_abs_r_separated": round(min_r, 6),
        "separated_pcs": [j + 1 for j in separated],
        "structure_block_size": int(m),
        "subspace_min_cos": round(subspace_min_cos, 6),
        "pass": bool(min_r > 0.999 and subspace_min_cos > 0.999),
    }
    print(json.dumps(summary))
    return 0 if summary["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())

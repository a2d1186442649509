"""Biobank-scale end-to-end benchmark (r3 VERDICT #1 / BASELINE.md:29).

Runs the FULL workflow — synthetic biobank BED -> QC -> EigenSNP PCA at
k=40 — at a bigger-than-HBM shape (default 1,048,576 SNPs x 102,400
samples: 26.8 GB BED, ~25 GB post-QC packed, forced through the
host-streamed container with the 2-D q8 kernels), then certifies the
output with:

  1. a float64 Rayleigh-quotient residual per PC, streamed over the
     full matrix on host (independent of every device kernel), and
  2. a sample-subset oracle run: the framework on a block-aligned
     SNP subset x a random sample keep-list vs exact float64 PCA,
     per-PC |r|.

The reference's I/O benchmark targets exactly this regime
(/root/reference/tests/disk.py:10-28); the reference itself publishes
no numbers (BASELINE.md).

Environment note (relay backends): the tunneled single-chip backend
used for validation mirrors every uploaded device buffer in host RAM
and does not release the mirrors on deletion (measured: RSS grows 1:1
with cumulative uploads).  A MONOLITHIC run therefore needs its TOTAL
uploaded bytes — three full-matrix passes: stage 1+2, the refinement
pass, and the fused tsq+capture pass — to fit host RAM, which on a
125 GB host caps the packed matrix near 26 GB/pass and rules out even
the 102,400-sample default.  The default `run_workflow(split=True)`
composition instead runs ONE full-matrix pass per OS process via
`--eigensnp-stop-after-checkpoint`, so the per-process bound is a
single pass (~25 GB at the 1M x 102,400 default) plus the ~26.8 GB BED
page cache pressure; that is the budget the default is sized to.
1M x 131,072 (a 34.4 GB pass) OOM-killed this host monolithically but
COMPLETES through the split legs on a quiet 125 GB host (measured round
5: 3,399 s e2e with certification — VALIDATION.md round 5); keep the
102,400 default on busy hosts.  Real TPU hosts stream
through pinned buffers and have no such cap.  Additionally, device_put
from worker threads leaks on this backend (never freed): all uploads
go through the main thread.

Stages and rates print for VALIDATION.md.  The fileset persists under
--out-dir and regenerates only when missing (--regen to force).

Usage:
  python scripts/biobank_bench.py --out-dir /tmp/biobank          # full
  python scripts/biobank_bench.py --skip-oracle --skip-residual   # run only
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

log = logging.getLogger("biobank_bench")


def generate(out_dir: Path, d: int, n: int, n_blocks: int, seed: int,
             strip: int = 4096) -> None:
    """Structured synthetic biobank fileset, written strip-by-strip
    DIRECTLY as packed PLINK codes (no int8 intermediate — the
    34 GB-scale fileset is memory-bandwidth-bound to generate, so
    everything stays uint8: one RNG byte per genotype, per-(SNP, pop)
    threshold tables gathered per sample).

    64 populations with geometrically decaying drift (top ~40 PCs are
    real structure over the bulk; ~10% eigengap spacing — resolvable
    per-PC at biobank scale where signal-to-bulk f*sqrt(D*N) >> 1,
    unlike a flat-fst degenerate cluster).  HWE genotypes from a single
    uniform byte r: hom-alt if r < 256 p^2, het if < 256 p(2-p); the
    r == 255 slice (~0.39%) becomes missing.  MAF in (0.05, 0.5).
    """
    n_pops = 64
    rng = np.random.default_rng(seed)
    pop = rng.integers(0, n_pops, n)
    fst_pop = 0.15 * (0.90 ** np.arange(n_pops)) + 0.005
    t0 = time.perf_counter()
    if n % 4:
        raise ValueError("generator requires n_samples % 4 == 0")

    from genomic_pca_tpu.io.native import synth_pack_native

    out_dir.mkdir(parents=True, exist_ok=True)
    with open(out_dir / "biobank.bed", "wb") as fh:
        fh.write(b"\x6c\x1b\x01")
        for lo in range(0, d, strip):
            rows = min(strip, d - lo)
            p_anc = rng.uniform(0.05, 0.95, rows)
            p_pop = np.empty((rows, n_pops), dtype=np.float64)
            for j in range(n_pops):
                fj = fst_pop[j]
                p_pop[:, j] = rng.beta(
                    p_anc * (1 - fj) / fj, (1 - p_anc) * (1 - fj) / fj
                )
            # Per-(SNP, pop) byte thresholds (tiny f64 math).
            a_pop = np.minimum(p_pop * p_pop * 256.0, 255).astype(np.uint8)
            b_pop = np.minimum(
                p_pop * (2.0 - p_pop) * 256.0, 255
            ).astype(np.uint8)
            # Native single-pass PRNG + threshold + 2-bit pack (the
            # 34 GB-class fileset is bandwidth-bound; the numpy path
            # below makes 5+ strip-sized passes).
            packed = synth_pack_native(
                a_pop, b_pop, pop.astype(np.uint8), seed=seed, row0=lo
            )
            if packed is None:  # numpy fallback, same model
                a = a_pop[:, pop]
                b = b_pop[:, pop]
                r = rng.integers(0, 256, (rows, n), dtype=np.uint8)
                # PLINK codes (count_A1): 00 = dosage 2 (r < a),
                # 10 = het (a <= r < b), 11 = dosage 0 (r >= b),
                # 01 = missing (r == 255, subset of r >= b since b < 256)
                code = (r >= a).astype(np.uint8)
                code <<= 1
                code += r >= b
                code -= (r == 255).astype(np.uint8) << 1
                packed = (
                    code[:, 0::4]
                    | (code[:, 1::4] << 2)
                    | (code[:, 2::4] << 4)
                    | (code[:, 3::4] << 6)
                )
            fh.write(packed.tobytes())
            if lo % (32 * strip) == 0 and lo:
                done = lo / d
                el = time.perf_counter() - t0
                print(f"  gen {lo}/{d} rows ({100*done:.0f}%, {el:.0f}s "
                      f"elapsed, eta {el/done - el:.0f}s)", flush=True)

    with open(out_dir / "biobank.bim", "w") as fh:
        chunk = 250_000
        for lo in range(0, d, chunk):
            hi = min(lo + chunk, d)
            fh.write("".join(
                f"1\tsnp{i}\t0\t{10 * i + 10}\tA\tC\n" for i in range(lo, hi)
            ))
    with open(out_dir / "biobank.fam", "w") as fh:
        for lo in range(0, n, 250_000):
            hi = min(lo + 250_000, n)
            fh.write("".join(
                f"sample{i}\tsample{i}\t0\t0\t0\t-9\n" for i in range(lo, hi)
            ))
    edges = np.linspace(0, d * 10 + 20, n_blocks + 1, dtype=np.int64)
    with open(out_dir / "blocks.tsv", "w") as fh:
        for i in range(n_blocks):
            fh.write(f"1 {edges[i] + 1} {edges[i + 1]}\n")
    print(f"  generated {d}x{n} in {time.perf_counter() - t0:.0f}s "
          f"({(out_dir / 'biobank.bed').stat().st_size / 2**30:.1f} GB)",
          flush=True)


def run_workflow(out_dir: Path, k: int, prefix: str = "run",
                 split: bool = True) -> dict:
    """Full BED -> QC -> EigenSNP k=40 workflow with stage timings.

    `split=True` (default) runs the workflow as THREE checkpointed CLI
    invocations — stage 1+2 / refinement pass / capture+outputs — one
    full-matrix pass per OS process.  Numerically identical to the
    monolithic run (tests/test_checkpoint.py chain test); required on
    relay backends whose IFRT-proxy client retains a host mirror of
    EVERY device upload for the life of the process (measured: +64 MB
    RSS per 64 MB upload, never freed — the monolithic run's three
    passes OOM-killed a 125 GB host at 1M x 102k).  Real TPU hosts can
    run `split=False`.
    """
    # max_hwe_p=1.0 disables the HWE filter: the cohort is deliberately
    # structured (64 populations), and pooled-sample HWE at N=131k
    # rejects exactly the differentiated SNPs (Wahlund effect) — real
    # mixed-ancestry pipelines HWE-filter within ancestry, which this
    # synthetic benchmark has no labels for.
    t0 = time.perf_counter()
    if not split:
        from genomic_pca_tpu.config import DataPrepConfig, EigenSnpConfig
        from genomic_pca_tpu.workflows import run_eigensnp_workflow

        cfg = DataPrepConfig(
            bed_path=str(out_dir / "biobank"),
            ld_block_path=str(out_dir / "blocks.tsv"),
            max_hwe_p=1.0,
        )
        ecfg = EigenSnpConfig(k_global=k)
        run_eigensnp_workflow(cfg, ecfg, str(out_dir / prefix),
                              write_moments=True)
        return {"wall_seconds": round(time.perf_counter() - t0, 1)}

    import shutil
    import subprocess

    repo = Path(__file__).resolve().parent.parent
    ck = out_dir / "ckpt"
    # A leftover chain from a previous benchmark run would make the
    # legs resume (exit immediately) and report a fake e2e time.
    shutil.rmtree(ck, ignore_errors=True)
    base = [
        sys.executable, "-m", "genomic_pca_tpu", "--eigensnp",
        "--bed-file", str(out_dir / "biobank"),
        "--ld-block-file", str(out_dir / "blocks.tsv"),
        "-o", str(out_dir / prefix),
        "--eigensnp-k-global", str(k),
        "--eigensnp-max-hwe-p", "1.0",
        "--eigensnp-checkpoint-dir", str(ck),
        "--write-moments", "--log-level", "Info",
    ]
    legs = [
        ("stages_1_2+global", ["--eigensnp-stop-after-checkpoint",
                               "stage2_basis"]),
        ("refinement_pass", ["--eigensnp-stop-after-checkpoint",
                             "refine_pass_0"]),
        ("capture+outputs", []),
    ]
    leg_walls = {}
    for name, extra in legs:
        t1 = time.perf_counter()
        print(f"  [leg] {name} ...", flush=True)
        r = subprocess.run(base + extra, cwd=str(repo))
        if r.returncode != 0:
            raise RuntimeError(f"workflow leg {name!r} failed "
                               f"(exit {r.returncode})")
        leg_walls[name] = round(time.perf_counter() - t1, 1)
        print(f"  [leg] {name} done in {leg_walls[name]}s", flush=True)
    return {
        "wall_seconds": round(time.perf_counter() - t0, 1),
        "legs": leg_walls,
        "composition": "3-process checkpointed (one matrix pass per "
                       "process; relay host-mirror bound)",
    }


def residual_certificate(out_dir: Path, prefix: str = "run",
                         strip: int = 8192,
                         backend: str = "auto") -> dict:
    """Float64 Rayleigh residual per PC over the FULL matrix.

    Reads the workflow's scores + moments, streams the BED once, and
    computes r_j = ||G v_j - rho_j v_j|| / rho_j for the normalized
    score directions v_j (G = X^T X, never materialized; rho_j = the
    Rayleigh quotient).  Independent of the ENTIRE production compute
    path in both backends — neither touches the Pallas kernels, the q8
    quantization, the packed device layout, or the fused programs:

    * host   — BED decode + in-place f32 standardize + BLAS GEMM per
               strip, float64 inter-strip accumulation.  Fully
               device-free, but bandwidth-bound: on a loaded shared
               host (0.1-1 GB/s measured) the 107-Ggenotype pass takes
               hours.
    * device — the identical math as plain jnp f32 ops (XLA matmuls
               on dense unpacked strips; no custom kernels), float64
               accumulation still on host.  Bound by the strip upload
               link instead of host bandwidth.
    * auto   — device when an accelerator is attached, else host.
    """
    import jax
    import jax.numpy as jnp

    from genomic_pca_tpu.io.bed import BedReader
    from genomic_pca_tpu.io.writers import read_moments

    t0 = time.perf_counter()
    with open(out_dir / f"{prefix}.eigensnp.pca.tsv") as fh:
        fh.readline()
        scores = np.asarray(
            [ln.rstrip("\n").split("\t")[1:] for ln in fh], dtype=np.float64
        )
    ids, _a1, _a2, means, stds = read_moments(
        out_dir / f"{prefix}.eigensnp.moments.tsv"
    )
    bed = BedReader(str(out_dir / "biobank"))
    pos_of = {sid: i for i, sid in enumerate(bed.bim.sid)}
    rows = np.asarray([pos_of[v] for v in ids], dtype=np.int64)
    inv = np.where(stds > 0, 1.0 / np.where(stds > 0, stds, 1.0), 0.0)
    means32 = means.astype(np.float32)
    inv32 = inv.astype(np.float32)

    if backend == "auto":
        backend = (
            "device" if jax.devices()[0].platform not in ("cpu",) else "host"
        )
    print(f"  residual backend: {backend}", flush=True)

    v = scores / np.linalg.norm(scores, axis=0, keepdims=True)  # (N, k)
    v32 = v.astype(np.float32)
    n = scores.shape[0]
    acc = np.zeros_like(v)  # G v, accumulated f64

    if backend == "device":
        dev = jax.devices()[0]
        v_dev = jax.device_put(v32, dev)
        code_map = jnp.asarray([2, 0, 1, 0], dtype=jnp.int8)
        code_ok = jnp.asarray([1.0, 0.0, 1.0, 1.0], dtype=jnp.float32)

        @jax.jit
        def _strip_gv(pk, m, iv, vd):
            # Plain XLA on the RAW packed bytes (4x less relay upload
            # than dense int8): 2-bit unpack via shifts + take, then
            # standardize and two f32 matmuls.  No Pallas, no
            # quantization, none of the production device programs.
            codes = jnp.stack(
                [(pk >> (2 * p)) & 0b11 for p in range(4)], axis=-1
            ).reshape(pk.shape[0], -1)[:, :n]
            # count_a1 code meanings: 0 -> 2, 1 -> missing, 2 -> 1,
            # 3 -> 0 (io/bed.py:_build_lut); missing imputes to the
            # mean, i.e. contributes exactly 0 after centering.
            x = jnp.take(code_map, codes).astype(jnp.float32)
            ok = jnp.take(code_ok, codes)
            x = (x - m[:, None]) * iv[:, None] * ok
            return jnp.dot(
                x.T, jnp.dot(x, vd, precision="highest"),
                precision="highest",
            )

        for lo in range(0, len(rows), strip):
            hi = min(lo + strip, len(rows))
            pk = bed.read_packed(rows[lo:hi])  # (s, ceil(N/4)) uint8
            part = _strip_gv(
                jax.device_put(pk, dev),
                jax.device_put(means32[lo:hi], dev),
                jax.device_put(inv32[lo:hi], dev),
                v_dev,
            )
            acc += np.asarray(part, dtype=np.float64)
            if lo % (8 * strip) == 0:
                print(f"  residual pass {lo}/{len(rows)} rows "
                      f"({time.perf_counter() - t0:.0f}s)", flush=True)
    else:
        for lo in range(0, len(rows), strip):
            hi = min(lo + strip, len(rows))
            g = bed.read(rows[lo:hi])  # (s, N) int8, native decode
            # In-place f32 standardize: centered missing entries are
            # exactly 0 == mean imputation (no f64 intermediates).
            x = g.astype(np.float32)
            np.subtract(x, means32[lo:hi, None], out=x)
            x[g == -127] = 0.0
            np.multiply(x, inv32[lo:hi, None], out=x)
            acc += (x.T @ (x @ v32)).astype(np.float64)
            if lo % (8 * strip) == 0:
                print(f"  residual pass {lo}/{len(rows)} rows "
                      f"({time.perf_counter() - t0:.0f}s)", flush=True)
    rho = (v * acc).sum(axis=0)  # Rayleigh quotients
    res = np.linalg.norm(acc - v * rho, axis=0) / rho
    return {
        "backend": backend,
        "residual_per_pc": [float(f"{r:.3e}") for r in res],
        "max_residual": float(f"{res.max():.3e}"),
        "rayleigh_eigenvalue_ratio_pc1": float(
            f"{rho[0] / ((n - 1) * _read_eigenvalues(out_dir, prefix)[0]):.6f}"
        ),
        "seconds": round(time.perf_counter() - t0, 1),
    }


def _read_eigenvalues(out_dir: Path, prefix: str) -> np.ndarray:
    with open(out_dir / f"{prefix}.eigenvalues.tsv") as fh:
        fh.readline()
        return np.asarray([ln.split("\t")[1] for ln in fh], dtype=np.float64)


def subset_oracle(out_dir: Path, k: int, n_sub_blocks: int = 128,
                  n_sub_samples: int = 8192, seed: int = 11) -> dict:
    """Framework on a block-aligned SNP subset x a random sample
    keep-list vs exact float64 PCA on the identical submatrix."""
    from genomic_pca_tpu.config import DataPrepConfig, EigenSnpConfig
    from genomic_pca_tpu.io.bed import BedReader
    from genomic_pca_tpu.models.eigensnp import compute_eigensnp_pca
    from genomic_pca_tpu.models.exact import exact_pca_from_strips
    from genomic_pca_tpu.models.prepare import prepare_data

    t0 = time.perf_counter()
    rng = np.random.default_rng(seed)
    bed = BedReader(str(out_dir / "biobank"))
    n_sub_samples = min(n_sub_samples, bed.n_samples)
    keep = np.sort(rng.choice(bed.n_samples, n_sub_samples, replace=False))
    keep_path = out_dir / "oracle_keep.txt"
    with open(keep_path, "w") as fh:
        for i in keep:
            fh.write(f"sample{i}\n")
    blocks = (out_dir / "blocks.tsv").read_text().splitlines()[:n_sub_blocks]
    sub_blocks = out_dir / "oracle_blocks.tsv"
    sub_blocks.write_text("\n".join(blocks) + "\n")

    cfg = DataPrepConfig(
        bed_path=str(out_dir / "biobank"),
        ld_block_path=str(sub_blocks),
        sample_keep_path=str(keep_path),
        max_hwe_p=1.0,  # structured cohort; see run_workflow
    )
    prep = prepare_data(cfg)
    res = compute_eigensnp_pca(prep, EigenSnpConfig(k_global=k))

    raw = bed.read(prep.pca_snp_orig_indices, prep.qc_sample_indices)
    exact = exact_pca_from_strips(
        iter([raw]), len(keep), k=k, config=cfg, scale=True, apply_qc=False
    )
    rr = [
        abs(float(np.corrcoef(res.scores[:, j], exact.scores[:, j])[0, 1]))
        for j in range(k)
    ]
    # Per-PC |r| is only meaningful where the SUBMATRIX spectrum is
    # separated: a 1/8-SNP x 1/12-sample subset pushes the cohort's
    # trailing drift components toward degeneracy, and within a
    # (near-)degenerate eigenspace individual PCs have rotational
    # freedom — both the framework and the exact solver return
    # arbitrary bases of the same subspace.  Report (a) per-PC |r| over
    # the eigengap-separated prefix and (b) the principal-angle
    # subspace affinity over the FULL k, which is rotation-invariant.
    ev = np.asarray(exact.eigenvalues, dtype=np.float64)[:k]
    rel_gap = (ev[:-1] - ev[1:]) / np.maximum(ev[:-1], 1e-300)
    sep_k = k
    for j in range(k - 1):
        if rel_gap[j] < 0.02:  # < 2% gap: treat the tail as degenerate
            sep_k = j + 1
            break
    qf, _ = np.linalg.qr(np.asarray(res.scores, dtype=np.float64))
    qe, _ = np.linalg.qr(np.asarray(exact.scores, dtype=np.float64))
    # Subspace affinity over the SEPARATED prefix: rotation-invariant
    # within the window AND gapped at its boundary, so it is
    # well-conditioned (the full-k subspace is not when the cut at k
    # lands inside the quasi-degenerate bulk — Davis-Kahan: the
    # perturbation bound scales with 1/gap at the boundary).
    cos_sep = np.linalg.svd(
        qf[:, :sep_k].T @ qe[:, :sep_k], compute_uv=False
    )
    cosines = np.linalg.svd(qf.T @ qe, compute_uv=False)
    np.savez(
        out_dir / "oracle_scores.npz",
        framework=np.asarray(res.scores, dtype=np.float32),
        exact=np.asarray(exact.scores, dtype=np.float32),
        exact_eigenvalues=ev,
    )
    return {
        "subset_snps": int(prep.n_pca_snps),
        "subset_samples": int(len(keep)),
        "well_separated_k": int(sep_k),
        "per_pc_abs_r_min_separated": float(f"{min(rr[:sep_k]):.6f}"),
        "subspace_min_principal_cosine_separated": float(
            f"{cos_sep.min():.6f}"
        ),
        "subspace_min_principal_cosine_full_k": float(
            f"{cosines.min():.6f}"
        ),
        "per_pc_abs_r_min": float(f"{min(rr):.6f}"),
        "per_pc_abs_r": [float(f"{r:.5f}") for r in rr],
        "exact_rel_eigengap": [float(f"{g:.4f}") for g in rel_gap],
        "seconds": round(time.perf_counter() - t0, 1),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", default="/tmp/biobank")
    ap.add_argument("--snps", type=int, default=1_048_576)
    ap.add_argument("--samples", type=int, default=102_400)
    ap.add_argument("--blocks", type=int, default=1024)
    ap.add_argument("--k", type=int, default=40)
    ap.add_argument("--seed", type=int, default=2025)
    ap.add_argument("--regen", action="store_true")
    ap.add_argument("--generate-only", action="store_true")
    ap.add_argument("--skip-run", action="store_true")
    ap.add_argument("--skip-residual", action="store_true")
    ap.add_argument("--skip-oracle", action="store_true")
    ap.add_argument("--residual-backend", default="auto",
                    choices=("auto", "host", "device"),
                    help="Where the residual certificate's strip math "
                         "runs (both are independent of the production "
                         "compute path; see residual_certificate).")
    args = ap.parse_args()

    logging.basicConfig(
        level=logging.INFO,
        format="[%(asctime)s %(levelname)s %(name)s] %(message)s",
        datefmt="%H:%M:%S",
    )
    out_dir = Path(args.out_dir)
    summary: dict = {
        "config": {
            "snps": args.snps, "samples": args.samples, "k": args.k,
            "ld_blocks": args.blocks,
        }
    }

    bed = out_dir / "biobank.bed"
    want = 3 + args.snps * ((args.samples + 3) // 4)
    if args.regen or not bed.exists() or bed.stat().st_size != want:
        print(f"generating {args.snps}x{args.samples} fileset...", flush=True)
        generate(out_dir, args.snps, args.samples, args.blocks, args.seed)
    else:
        print("fileset present; skipping generation", flush=True)
    if args.generate_only:
        return 0

    if not args.skip_run:
        print("\n=== full workflow (BED -> QC -> EigenSNP k=%d) ===" % args.k,
              flush=True)
        summary["workflow"] = run_workflow(out_dir, args.k)
        summary["workflow"]["snps_per_sec_e2e"] = round(
            args.snps / summary["workflow"]["wall_seconds"], 1
        )

    if not args.skip_residual:
        print("\n=== float64 Rayleigh residual certificate ===", flush=True)
        summary["residual"] = residual_certificate(
            out_dir, backend=args.residual_backend
        )

    if not args.skip_oracle:
        print("\n=== sample/SNP-subset oracle concordance ===", flush=True)
        summary["oracle"] = subset_oracle(out_dir, args.k)

    print("\n" + json.dumps(summary, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

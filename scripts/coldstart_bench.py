"""Fresh-cache cold-start benchmark (r3 VERDICT #2).

Measures the END-TO-END wall-clock of an EigenSNP run at a
previously-unseen shape with an EMPTY persistent compilation cache —
the adoption-critical number (a new user's first real run).  Each
repetition uses a brand-new cache dir and a brand-new process, so
nothing is warm except the OS page cache for the fixture.

Prints per-run e2e seconds (subprocess wall AND the CLI's own total),
plus the workflow stage split, for VALIDATION.md.  `--log-compiles`
additionally surfaces the per-program compile timeline (jax_log_compiles)
to identify serialized compiles.

Usage: python scripts/coldstart_bench.py [--runs 3] [--snps 35840]
       [--samples 1088]
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def make_fixture(out_dir: Path, d: int, n: int, n_blocks: int,
                 seed: int = 5) -> None:
    from genomic_pca_tpu.io.bed import write_plink
    from tests.conftest import make_genotypes

    rng = np.random.default_rng(seed)
    g = make_genotypes(rng, d, n, missing_rate=0.005, n_pops=6, fst=0.15)
    write_plink(out_dir / "fix", g, bp=list(range(10, d * 10 + 10, 10)))
    edges = np.linspace(0, d * 10 + 20, n_blocks + 1, dtype=np.int64)
    with open(out_dir / "blocks.tsv", "w") as fh:
        for i in range(n_blocks):
            fh.write(f"1 {edges[i] + 1} {edges[i + 1]}\n")


def one_run(fix_dir: Path, k: int, log_compiles: bool) -> dict:
    cache = tempfile.mkdtemp(prefix="gptpu_cold_cache_")
    out = tempfile.mkdtemp(prefix="gptpu_cold_out_")
    env = dict(os.environ)
    env["JAX_COMPILATION_CACHE_DIR"] = cache
    env.setdefault("PYTHONPATH", str(REPO))
    if log_compiles:
        env["JAX_LOG_COMPILES"] = "1"
    cmd = [
        sys.executable, "-m", "genomic_pca_tpu", "--eigensnp",
        "--bed-file", str(fix_dir / "fix"),
        "--ld-block-file", str(fix_dir / "blocks.tsv"),
        "-o", f"{out}/r", "--eigensnp-k-global", str(k),
        "--eigensnp-min-subset-size", "100000",  # full-sample stage 1
        "--log-level", "Info",
    ]
    t0 = time.perf_counter()
    proc = subprocess.run(
        cmd, env=env, capture_output=True, text=True, timeout=600,
        cwd=str(REPO),
    )
    wall = time.perf_counter() - t0
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr[-3000:])
    txt = proc.stderr + proc.stdout
    total = None
    m = re.search(r"Total run time: ([0-9.]+)s", txt)
    if m:
        total = float(m.group(1))
    stages = dict(
        re.findall(r"stage '([^']+)' completed in ([0-9.]+)s", txt)
    )
    if log_compiles:
        for ln in txt.splitlines():
            if "Finished XLA compilation" in ln or "Compiling" in ln:
                print("   ", ln.strip()[:160])
    return {
        "subprocess_wall_s": round(wall, 2),
        "cli_total_s": total,
        "stages": {k2: float(v) for k2, v in stages.items()},
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--snps", type=int, default=35_840)
    ap.add_argument("--samples", type=int, default=1088)
    ap.add_argument("--blocks", type=int, default=12)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--log-compiles", action="store_true")
    ap.add_argument("--fixture-dir", default=None,
                    help="reuse an existing fixture dir")
    args = ap.parse_args()

    if args.fixture_dir:
        fix = Path(args.fixture_dir)
    else:
        fix = Path(tempfile.mkdtemp(prefix="gptpu_cold_fix_"))
        print(f"fixture {args.snps}x{args.samples} -> {fix}", flush=True)
        make_fixture(fix, args.snps, args.samples, args.blocks)

    results = []
    for i in range(args.runs):
        r = one_run(fix, args.k, args.log_compiles)
        results.append(r)
        print(f"run {i + 1}: e2e {r['cli_total_s']}s "
              f"(subprocess {r['subprocess_wall_s']}s) "
              f"stages={r['stages']}", flush=True)

    totals = [r["cli_total_s"] for r in results if r["cli_total_s"]]
    if totals:
        print(f"\nfresh-cache e2e over {len(totals)} consecutive runs: "
              f"{', '.join(f'{t:.1f}' for t in totals)} s "
              f"(max {max(totals):.1f})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

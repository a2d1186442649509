"""Wider-rhs steering schedule study (r3 VERDICT #5).

Question: should the q8 STEERING passes run a wider sketch (L=256/384)
than the 128-lane production width, trading FLOPs for the MXU's better
operand reuse at wide rhs?  The trace-based sweep gives the COST side
(on-device ms/iter per width); this script measures the ACCURACY side:
top-k subspace capture error of the steering basis after j passes, at
each width, against a float64 oracle on a structured genotype matrix.

The decision metric is time-to-accuracy: error as a function of
on-device milliseconds (passes x measured ms/iter), not per pass — a
wider pass may capture more per pass yet lose per millisecond.

Usage: python scripts/wide_steering_study.py [--snps 65536]
Prints a table for VALIDATION.md.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--snps", type=int, default=65_536)
    ap.add_argument("--samples", type=int, default=2048)
    ap.add_argument("--k", type=int, default=40)
    ap.add_argument("--widths", type=int, nargs="+", default=[128, 256, 384])
    ap.add_argument("--max-iters", type=int, default=4)
    ap.add_argument("--trace-iters", type=int, default=32,
                    help="iterations per trace capture for the ms/iter side")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from genomic_pca_tpu.parallel.mesh import VARIANT_AXIS, make_mesh
    from genomic_pca_tpu.parallel.sharded import (
        ShardedMatrix, pack_codes_device,
    )
    from genomic_pca_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    d, n, k = args.snps, args.samples, args.k
    print(f"platform={jax.devices()[0].platform} shape={d}x{n} k={k}")

    # Structured genotypes: more populations than k, with per-population
    # drift decaying geometrically, so the oracle's top-k PCs are all
    # REAL structure over a flat bulk tail — the production regime
    # (worst-of-k over a degenerate bulk would measure tie-breaking of
    # interchangeable directions, not convergence).
    rng = np.random.default_rng(7)
    n_pops = max(int(1.6 * k), 16)
    pop = rng.integers(0, n_pops, n)
    p_anc = rng.uniform(0.05, 0.95, d)
    fst_pop = 0.15 * (0.94 ** np.arange(n_pops)) + 0.01
    p_pop = np.empty((d, n_pops))
    for j in range(n_pops):
        fj = fst_pop[j]
        a_, b_ = p_anc * (1 - fj) / fj, (1 - p_anc) * (1 - fj) / fj
        p_pop[:, j] = rng.beta(a_, b_)
    u = rng.random((d, n))
    p_of = p_pop[:, pop]
    g = ((u < p_of**2) * 2 + ((u >= p_of**2) & (u < p_of * (2 - p_of)))
         ).astype(np.int8)

    # Float64 oracle: top-k right singular subspace of standardized A^T.
    mean = g.mean(axis=1)
    std = g.std(axis=1, ddof=1)
    inv = np.where(std > 0, 1.0 / np.where(std > 0, std, 1.0), 0.0)
    x = (g.astype(np.float64) - mean[:, None]) * inv[:, None]
    gram = x.T @ x
    w, v = np.linalg.eigh(gram)
    vk = v[:, ::-1][:, :k]  # (n, k) top-k eigenvectors

    # Device container: production packed + q8 steering.
    mesh = make_mesh(jax.devices()[:1])
    sh = NamedSharding(mesh, P(VARIANT_AXIS, None))
    g_dev = pack_codes_device(jnp.asarray(g))
    sm = ShardedMatrix(
        geno=jax.device_put(g_dev, sh),
        mean=jax.device_put(jnp.asarray(mean[:, None], jnp.float32), sh),
        inv_std=jax.device_put(jnp.asarray(inv[:, None], jnp.float32), sh),
        n_rows=d, n_samples=n, mesh=mesh, kernel_precision="q8",
    )

    # Cost side: trace-derived on-device ms/iter per width.
    import shutil
    import tempfile

    from genomic_pca_tpu.utils.xplane import module_device_ms

    ms_per_iter = {}
    for ell in args.widths:
        b = jnp.asarray(rng.standard_normal((n, ell)), dtype=jnp.float32)
        _ = np.asarray(sm.power_iterate(b, args.trace_iters))
        td = tempfile.mkdtemp()
        try:
            with jax.profiler.trace(td):
                _ = np.asarray(sm.power_iterate(b, args.trace_iters))
            ms, _c, err = module_device_ms(td)
        finally:
            shutil.rmtree(td, ignore_errors=True)
        ms_per_iter[ell] = (ms / args.trace_iters) if ms else float("nan")
        print(f"  ell={ell}: {ms_per_iter[ell]:.3f} ms/iter on-device")

    # Accuracy side: top-k capture error of the steering basis.  For
    # each width/pass count, worst-PC leakage
    # max_j (1 - ||B^T v_j||^2) — the fraction of oracle PC j outside
    # span(B).  Same seed across widths; the 128-wide sketch is the
    # prefix of the wider ones.
    b0_full = rng.standard_normal((n, max(args.widths))).astype(np.float32)
    print(f"\nworst-PC leakage (1 - ||B^T v_j||^2, max over top-{k}) "
          "and cumulative on-device ms:")
    hdr = "passes | " + " | ".join(
        f"L={ell}: leak / ms" for ell in args.widths
    )
    print(hdr)
    for iters in range(1, args.max_iters + 1):
        cells = []
        for ell in args.widths:
            b0 = jnp.asarray(b0_full[:, :ell])
            basis = np.asarray(sm.power_iterate(b0, iters))
            proj = basis.T @ vk  # (ell, k)
            cap = (proj * proj).sum(axis=0)  # ||B^T v_j||^2 per PC
            leak = float(np.max(1.0 - cap))
            cells.append(f"{leak:.2e} / {iters * ms_per_iter[ell]:6.2f}")
        print(f"  {iters}    | " + " | ".join(cells))

    print(
        "\nReading: compare leakage at equal MILLISECONDS across "
        "columns.  If the L=128 column reaches any target leakage in "
        "fewer on-device ms, the wider steering schedule loses despite "
        "its higher TFLOP/s."
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

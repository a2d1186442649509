"""On-chip MFU evidence: jax.profiler trace of the fused power-iteration
kernel + an rhs-width sweep that separates kernel inefficiency from the
hardware's skinny-rhs matmul bound.

Produces (printed, for VALIDATION.md):
  1. Measured TFLOP/s at the production sketch width (ell=128) through
     `ShardedMatrix.power_iterate` — in-loop, one dispatch.
  2. An ell sweep (128/256/512): if TFLOP/s rises with a wider rhs, the
     ~X TFLOP/s at ell=128 is the MXU operand-reuse bound for that
     shape, not kernel overhead.
  3. A device-op table parsed from the captured xplane trace (xprof):
     per-op total device time — shows where the on-chip time goes
     (fused kernel vs DMA vs collectives).

Usage: python scripts/mfu_trace.py [--trace-dir /tmp/mfu_trace]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from genomic_pca_tpu.utils.xplane import (  # noqa: E402
    device_op_table as parse_xplane,
    module_device_ms,
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default="/tmp/mfu_trace")
    ap.add_argument("--snps", type=int, default=262_144)
    ap.add_argument("--samples", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--layout", default="dense", choices=("dense", "packed"),
                    help="dense int8 residency or the production PLINK "
                    "2-bit packed layout (traces fused_gram_q8_packed)")
    ap.add_argument("--precision", default="q8", choices=("q8", "bf16"),
                    help="power-loop kernel precision for the container")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from genomic_pca_tpu.parallel.mesh import VARIANT_AXIS, make_mesh
    from genomic_pca_tpu.parallel.sharded import ShardedMatrix
    from genomic_pca_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    d, n = args.snps, args.samples
    platform = jax.devices()[0].platform
    print(f"platform={platform} kind={jax.devices()[0].device_kind}")

    @jax.jit
    def make_data(key):
        k1, k2, k3 = jax.random.split(key, 3)
        thresh = jax.random.randint(k1, (d, 1), 8, 128, dtype=jnp.int32)
        r1 = jax.random.randint(k2, (d, n), 0, 256, jnp.int32)
        r2 = jax.random.randint(k3, (d, n), 0, 256, jnp.int32)
        g = ((r1 < thresh).astype(jnp.int8) + (r2 < thresh)).astype(jnp.int8)
        n1 = jnp.sum(g == 1, axis=1, dtype=jnp.float32)
        n2 = jnp.sum(g == 2, axis=1, dtype=jnp.float32)
        mean = (n1 + 2.0 * n2) / n
        ssd = (n1 + 4.0 * n2) - n * mean * mean
        std = jnp.sqrt(jnp.maximum(ssd / (n - 1), 0.0))
        inv = jnp.where(std > 0, 1.0 / jnp.where(std > 0, std, 1.0), 0.0)
        return g, mean[:, None], inv[:, None]

    from genomic_pca_tpu.parallel.sharded import pack_codes_device as pack_codes

    mesh = make_mesh(jax.devices()[:1])
    sh = NamedSharding(mesh, P(VARIANT_AXIS, None))
    g_dev, m_dev, iv_dev = make_data(jax.random.key(0))
    if args.layout == "packed":
        g_dev = pack_codes(g_dev)
    sm = ShardedMatrix(
        geno=jax.device_put(g_dev, sh), mean=jax.device_put(m_dev, sh),
        inv_std=jax.device_put(iv_dev, sh), n_rows=d, n_samples=n, mesh=mesh,
        kernel_precision=args.precision,
    )
    print(f"layout={args.layout} precision={args.precision} mode={sm.mode}")
    rng = np.random.default_rng(0)

    # --- rhs-width sweep -------------------------------------------------
    print("\nell sweep (in-loop, one dispatch per measurement):")
    results = {}
    for ell in (128, 256, 512):
        b = jnp.asarray(rng.standard_normal((n, ell)), dtype=np.float32)
        _ = np.asarray(sm.power_iterate(b, args.iters))  # warm exact program
        dt = float("inf")
        for _rep in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(sm.power_iterate(b, args.iters))
            dt = min(dt, time.perf_counter() - t0)
        tflops = 4.0 * d * n * ell * args.iters / dt / 1e12
        results[ell] = tflops
        print(f"  ell={ell:4d}: {dt*1e3/args.iters:8.2f} ms/iter  "
              f"{tflops:6.1f} TFLOP/s")
    if results[512] > 1.15 * results[128]:
        print("  -> TFLOP/s rises with rhs width: the ell=128 rate is the "
              "MXU operand-reuse bound for that shape, not kernel overhead.")
    else:
        print("  -> TFLOP/s flat in rhs width: kernel-side bound; "
              "investigate further.")

    # --- on-chip trace at the production width ---------------------------
    b = jnp.asarray(rng.standard_normal((n, 128)), dtype=np.float32)
    _ = np.asarray(sm.power_iterate(b, args.iters))
    with jax.profiler.trace(args.trace_dir):
        for _rep in range(2):
            _ = np.asarray(sm.power_iterate(b, args.iters))
    rows, err = parse_xplane(args.trace_dir)
    print(f"\ndevice-op table from {args.trace_dir}:")
    if rows is None:
        print(f"  (unavailable: {err})")
    else:
        total = sum(t for _op, t, _c in rows)
        for op, t, c in rows:
            print(f"  {t/1e3:9.3f} ms  x{c:<5d} {op[:80]}")
        print(f"  top-op device total: {total/1e3:.3f} ms over 2x{args.iters} iters")
    mod_ms, n_mod, merr = module_device_ms(args.trace_dir)
    if mod_ms is not None:
        iters_total = 2 * args.iters
        print(
            f"  module-level device time: {mod_ms:.3f} ms / {n_mod} "
            f"dispatches = {mod_ms/iters_total:.3f} ms/iter on-device"
        )
    else:
        print(f"  (module-level device time unavailable: {merr})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

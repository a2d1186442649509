"""Tune the fused gram kernel with DEVICE-RESIDENT timing loops.

Per-dispatch latency through the relayed backend is ~50 ms, so anything
timed call-by-call measures the relay, not the kernel.  Every variant
here runs `n_iter` passes inside one `fori_loop` dispatch with a cheap
data dependence between iterations (so XLA cannot hoist the pass out of
the loop), mirroring how production code runs (`ShardedMatrix.power_k`).

Reported references: raw HBM int8-read bandwidth (speed-of-light for
the memory-bound regime) and a pure-bf16 XLA gram (no int8 dequant), to
locate the bottleneck.  Informs defaults in parallel/sharded.py.

Usage: python scripts/tune_kernels.py [n_samples]
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_ITER = 32


def timeit(fn, *args, reps=3):
    np.asarray(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / N_ITER  # per loop iteration


def main() -> None:
    import jax
    import jax.numpy as jnp

    from genomic_pca_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from genomic_pca_tpu.ops import pallas_kernels as pk

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    d = 262_144
    gbytes = d * n

    @jax.jit
    def make(key):
        k1, k2, k3 = jax.random.split(key, 3)
        thresh = jax.random.randint(k1, (d, 1), 8, 128, dtype=jnp.int32)
        r1 = jax.random.randint(k2, (d, n), 0, 256, jnp.int32)
        r2 = jax.random.randint(k3, (d, n), 0, 256, jnp.int32)
        return ((r1 < thresh).astype(jnp.int8) + (r2 < thresh)).astype(jnp.int8)

    g = make(jax.random.key(0))
    mean = jnp.full((d, 1), 0.5, jnp.float32)
    inv = jnp.full((d, 1), 1.3, jnp.float32)
    print(f"geno: {d} x {n} int8 = {gbytes/2**20:.0f} MiB, "
          f"{N_ITER} iters/dispatch")

    # --- raw HBM read bandwidth (iteration-dependent fused add+reduce) --
    @jax.jit
    def hbm_loop(x):
        def body(i, acc):
            return acc + jnp.sum((x + i.astype(jnp.int8)).astype(jnp.int32))
        return jax.lax.fori_loop(0, N_ITER, body, jnp.int32(0))

    dt = timeit(hbm_loop, g)
    print(f"raw HBM int8 read: {gbytes/dt/1e9:7.0f} GB/s  ({dt*1e3:.2f} ms/pass)")

    ell = 128
    flops = 4.0 * d * n * ell

    def report(tag, dt):
        print(f"  {tag:34s}: {dt*1e3:6.2f} ms/iter  {flops/dt/1e12:6.1f} "
              f"TFLOP/s  read {gbytes/dt/1e9:5.0f} GB/s")

    def loop_of(pass_fn):
        """b <- normalized pass(b): forces sequential execution."""
        @jax.jit
        def run(g_, m_, iv_, b0):
            def body(_, cur):
                t = pass_fn(g_, m_, iv_, cur)
                return t / (jnp.linalg.norm(t, axis=0, keepdims=True) + 1e-9)
            return jax.lax.fori_loop(0, N_ITER, body, b0)
        return run

    b0 = jnp.asarray(
        np.random.default_rng(0).standard_normal((n, ell)), jnp.float32
    )

    # --- pure bf16 XLA gram (pre-materialized, no dequant) --------------
    @jax.jit
    def xla_bf16_loop(x, b0):
        def body(_, cur):
            w = jnp.dot(x, cur.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
            t = jnp.dot(x.T, w.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
            return t / (jnp.linalg.norm(t, axis=0, keepdims=True) + 1e-9)
        return jax.lax.fori_loop(0, N_ITER, body, b0)

    x_bf16 = jnp.ones((d, n), jnp.bfloat16)
    dt = timeit(xla_bf16_loop, x_bf16, b0)
    print("\nreferences (L=128):")
    report("XLA bf16 gram (2 B/elem, no dequant)", dt)

    # --- XLA int8 gram (standardize inline, scan over strips) ----------
    from genomic_pca_tpu.ops.standardize import standardize_rows

    @jax.jit
    def xla_int8_loop(g_, m_, iv_, b0):
        g3 = g_.reshape(d // 2048, 2048, n)

        def one_pass(cur):
            def body(acc, gg):
                a = standardize_rows(gg, m_[:2048, 0] * 0 + 0.5,
                                     iv_[:2048, 0] * 0 + 1.3)
                ab = a.astype(jnp.bfloat16)
                w = jnp.dot(ab, cur.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
                return acc + jnp.dot(ab.T, w.astype(jnp.bfloat16),
                                     preferred_element_type=jnp.float32), None
            acc, _ = jax.lax.scan(body, jnp.zeros((n, ell), jnp.float32), g3)
            return acc

        def body(_, cur):
            t = one_pass(cur)
            return t / (jnp.linalg.norm(t, axis=0, keepdims=True) + 1e-9)
        return jax.lax.fori_loop(0, N_ITER, body, b0)

    dt = timeit(xla_int8_loop, g, mean, inv, b0)
    report("XLA int8 scan gram (bf16 compute)", dt)

    # --- fused kernel: tile_d x precision -------------------------------
    print("\nfused gram kernel in-loop:")
    for prec in ("bf16", "f32"):
        for tile_d in (256, 512, 1024):
            if d % tile_d:
                continue
            fn = loop_of(functools.partial(
                pk.fused_gram_apply, tile_d=tile_d, precision=prec))
            try:
                dt = timeit(fn, g, mean, inv, b0)
            except Exception as e:
                print(f"  {prec} tile_d={tile_d}: FAIL "
                      f"{str(e).splitlines()[0][:60]}")
                continue
            report(f"{prec} tile_d={tile_d}", dt)

    # --- transpose-free accumulation variant ----------------------------
    # Contract over the row (sublane) dim with dot_general instead of
    # materializing x.T — tests whether Mosaic's transpose costs.
    def _gram_nt_kernel(g_ref, m_ref, iv_ref, b_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        gb = g_ref[:].astype(jnp.bfloat16)
        mask = jnp.clip(gb + jnp.bfloat16(127.0), 0.0, 1.0)
        x = (gb * iv_ref[:].astype(jnp.bfloat16)
             + (-m_ref[:] * iv_ref[:]).astype(jnp.bfloat16)) * mask
        b = b_ref[:].astype(jnp.bfloat16)
        w = jnp.dot(x, b, preferred_element_type=jnp.float32)
        out_ref[:] += jax.lax.dot_general(
            x, w.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def gram_nt(g_, m_, iv_, b, tile_d=512):
        return pl.pallas_call(
            _gram_nt_kernel,
            grid=(d // tile_d,),
            in_specs=[
                pl.BlockSpec((tile_d, n), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_d, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_d, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n, ell), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((n, ell), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, ell), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(g_, m_, iv_, b)

    print("\ntranspose-free dot_general variant:")
    for tile_d in (256, 512, 1024):
        fn = loop_of(functools.partial(gram_nt, tile_d=tile_d))
        try:
            dt = timeit(fn, g, mean, inv, b0)
        except Exception as e:
            print(f"  bf16-nt tile_d={tile_d}: FAIL "
                  f"{str(e).splitlines()[0][:60]}")
            continue
        report(f"bf16-nt tile_d={tile_d}", dt)

    # --- 2-D tiled kernels (biobank-wide N path) in-loop -----------------
    # gram = left(right(b)): the production pallas2d composition.
    print("\n2-D tiled kernels in-loop (same shape, pallas2d composition):")
    for tile_d, tile_n in ((512, 2048), (1024, 2048), (512, 1024),
                           (1024, 1024), (256, 2048)):
        if d % tile_d or n % tile_n:
            continue

        def gram2d(g_, m_, iv_, b, td=tile_d, tn=tile_n):
            w = pk.fused_right_apply_2d(g_, m_, iv_, b, tile_d=td,
                                        tile_n=tn, precision="bf16")
            return pk.fused_left_apply_2d(g_, m_, iv_, w, tile_d=td,
                                          tile_n=tn, precision="bf16")

        fn = loop_of(gram2d)
        try:
            dt = timeit(fn, g, mean, inv, b0)
        except Exception as e:
            print(f"  2d tile=({tile_d},{tile_n}): FAIL "
                  f"{str(e).splitlines()[0][:60]}")
            continue
        report(f"2d tile=({tile_d},{tile_n})", dt)


if __name__ == "__main__":
    main()

"""Device-time trace of the STREAMING strip kernel (VERDICT r3 #4).

The streaming container's wall-clock on this environment is bound by
the host->device relay link, so the q8-vs-bf16 kernel advantage never
shows in end-to-end timings here.  This script pins the KERNEL-side
number: it runs real forced-streaming power passes (packed strips,
host RAM source, the prefetch pipeline — exactly what
`PreparedData.load_streaming_matrix` builds) under jax.profiler and
reads the per-strip program's on-device time from the xplane module
table, for kernel_precision q8 and bf16.

Prints (for VALIDATION.md): on-device ms/strip for the q8 steering
strip program vs the bf16 exact strip program, their ratio, and the
implied TFLOP/s-equivalent through the streaming kernels.

Usage: python scripts/streaming_trace.py [--strips 8] [--strip-size 32768]
"""

from __future__ import annotations

import argparse
import shutil
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from genomic_pca_tpu.utils.xplane import module_table  # noqa: E402


def build_streaming(args, g_packed, mean, std, precision: str):
    from genomic_pca_tpu.ops.streaming import StreamingMatrix

    s = args.strip_size

    def source(i: int):
        sl = slice(i * s, (i + 1) * s)
        return g_packed[sl], mean[sl], std[sl]

    return StreamingMatrix(
        source,
        n_strips=args.strips,
        n_rows=args.strips * s,
        n_samples=args.samples,
        strip_size=s,
        packed=True,
        kernel_precision=precision,
        q8_polish=1,  # minimum legal polish; steering = iters - 1 passes
    )


def trace_pass(sm, b, n_iter: int):
    """One warm + one traced power_iterate; returns the module table."""
    _ = np.asarray(sm.power_iterate(b, n_iter))
    td = tempfile.mkdtemp(prefix="gptpu_stream_trace_")
    try:
        import jax

        t0 = time.perf_counter()
        with jax.profiler.trace(td):
            _ = np.asarray(sm.power_iterate(b, n_iter))
        wall = time.perf_counter() - t0
        rows, err = module_table(td)
        return rows, err, wall
    finally:
        shutil.rmtree(td, ignore_errors=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--strips", type=int, default=8)
    ap.add_argument("--strip-size", type=int, default=32_768)
    ap.add_argument("--samples", type=int, default=2048)
    ap.add_argument("--ell", type=int, default=128)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax

    print(f"platform={jax.devices()[0].platform} "
          f"kind={jax.devices()[0].device_kind}")
    d, n = args.strips * args.strip_size, args.samples
    rng = np.random.default_rng(0)

    # Host-RAM packed strips with exact moments — the load_streaming
    # source shape (PLINK bytes + per-row mean/std).
    from genomic_pca_tpu.parallel.sharded import pack_int8_rows

    g = (rng.random((d, n)) < rng.uniform(0.05, 0.5, (d, 1))).astype(
        np.int8
    ) + (rng.random((d, n)) < rng.uniform(0.05, 0.5, (d, 1))).astype(np.int8)
    mean = g.mean(axis=1).astype(np.float32)
    std = g.std(axis=1, ddof=1).astype(np.float32)
    g_packed = pack_int8_rows(g)
    b = rng.standard_normal((n, args.ell)).astype(np.float32)

    flops_per_strip = 4.0 * args.strip_size * n * args.ell

    results = {}
    for precision in ("q8", "bf16"):
        sm = build_streaming(args, g_packed, mean, std, precision)
        rows, err, wall = trace_pass(sm, b, args.iters)
        label = f"streaming {precision} (mode={sm.mode})"
        print(f"\n{label}: wall {wall:.2f}s for {args.iters} passes "
              f"x {args.strips} strips")
        if rows is None:
            print(f"  (module table unavailable: {err})")
            continue
        for nm, t, c in rows[:6]:
            print(f"  {t:9.3f} ms  x{c:<4d} {nm[:70]}")
        # Per-strip programs have >= strips invocations (QR / quantize
        # run once per pass).  The q8 container runs TWO per-strip
        # programs — steering (strips x (iters - 1)) and the exact
        # polish (strips x 1) — plus tiny per-strip accumulator adds;
        # the KERNEL program is the largest-total one.
        per_strip = [r for r in rows if r[2] >= args.strips]
        if not per_strip:
            print("  (no module with per-strip invocation count; "
                  "largest-total module used)")
            per_strip = [rows[0]]
        if precision == "q8":
            # The q8 run also executes the exact bf16 polish program
            # per strip; select the STEERING kernel(s) by name (with
            # the round-5 decode the steering total can drop below the
            # polish total, so largest-total would misattribute).  In
            # pallas2d mode the steering pass is TWO programs
            # (right_apply_2d_q8 + left_apply_2d_q8) — SUM the family
            # and divide by one program's call count so the per-strip
            # figure covers the whole pass in both modes.
            named = [r for r in per_strip if "q8" in r[0]]
            if named:
                per_strip = named
        else:
            # Exact path: keep only kernel-family programs (gram /
            # right / left applies) so glue like jit_add does not
            # pollute the family sum in pallas2d mode.
            named = [
                r for r in per_strip
                if "gram" in r[0] or "apply" in r[0]
            ]
            if named:
                per_strip = named
        calls = max(c for _nm, _t, c in per_strip)
        nm = max(per_strip, key=lambda r: r[1])[0]
        ms_per_strip = sum(t for _nm, t, _c in per_strip) / calls
        tflops = flops_per_strip / (ms_per_strip * 1e-3) / 1e12
        kind = "steering" if precision == "q8" else "exact"
        print(f"  -> {kind} strip program {nm[:50]}: {ms_per_strip:.3f} "
              f"ms/strip on-device = {tflops:.1f} TFLOP/s-equiv")
        results[precision] = ms_per_strip

    if "q8" in results and "bf16" in results:
        r = results["bf16"] / results["q8"]
        print(f"\nstreaming strip kernel on-device: q8 "
              f"{results['q8']:.3f} ms/strip vs bf16 "
              f"{results['bf16']:.3f} ms/strip -> q8 is {r:.2f}x faster "
              f"kernel-side (link-bound wall-clock hides this here; at "
              f"production PCIe the kernel rate is the bound)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Mesh-scaling measurement on virtual CPU devices.

Runs the sharded power-iteration pass over 1/2/4/8-device meshes
(XLA host-platform virtual devices) and reports SNPs/sec per mesh size —
a functional proxy for the 1 chip -> 1 host -> N hosts scaling ladder in
BASELINE.md (real multi-chip hardware is exercised by the driver's
`dryrun_multichip`).  On CPU the virtual devices share physical cores, so
the measurement validates *sharding overhead* (collectives, padding), not
parallel speedup.

Usage: python scripts/scaling_cpu.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def main() -> int:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from genomic_pca_tpu.parallel.mesh import make_mesh
    from genomic_pca_tpu.parallel.sharded import ShardedMatrix

    rng = np.random.default_rng(0)
    d, n, ell = 65536, 512, 32
    geno = rng.integers(0, 3, size=(d, n), dtype=np.int8)
    b = jnp.asarray(rng.standard_normal((n, ell)).astype(np.float32))

    results = {}
    ref = None
    for n_dev in (1, 2, 4, 8):
        mesh = make_mesh(jax.devices()[:n_dev])
        sm = ShardedMatrix.from_arrays(iter([geno]), mesh=mesh, mode="xla")
        out = np.asarray(sm.power_iterate(b, 2))  # warm-up/compile
        t0 = time.perf_counter()
        out = np.asarray(sm.power_iterate(b, 8))
        dt = time.perf_counter() - t0
        results[n_dev] = round(d * 8 / dt / 1e6, 2)
        if ref is None:
            ref = out
        else:
            # same result at every mesh size (up to f32 reduction order)
            for j in range(min(4, out.shape[1])):
                r = abs(np.corrcoef(out[:, j], ref[:, j])[0, 1])
                assert r > 0.999, (n_dev, j, r)

    print(json.dumps({"msnps_per_sec_by_mesh_size": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

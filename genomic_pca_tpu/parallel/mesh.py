"""Device mesh construction.

The framework's distribution model (SURVEY §2.3): the variant axis — the
huge dimension, tens of millions of SNPs — shards across devices/hosts on
a 1-D mesh axis "v"; samples stay replicated.  Per-shard Gram/sketch
contributions merge with `psum` over ICI.  This replaces the reference's
single-process rayon/flume parallelism (src/main.rs:103-106,
src/prepare.rs:169-920) with XLA collectives; there is no custom
transport.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh

VARIANT_AXIS = "v"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None, axis: str = VARIANT_AXIS
) -> Mesh:
    """1-D mesh over the given (default: all) devices."""
    import numpy as np

    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def initialize_distributed() -> None:
    """Multi-host process-group init (jax.distributed), no-op if single."""
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()

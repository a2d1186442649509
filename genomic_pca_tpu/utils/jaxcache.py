"""Persistent XLA compilation cache setup.

TPU compiles are expensive (minutes per program on remote-compile
backends); without a persistent cache every NEW PROCESS pays them again.
JAX ships the cache but leaves `jax_compilation_cache_dir` unset by
default — this module points it at a user cache directory the first time
any framework compute path runs.

Opt out with GENOMIC_PCA_TPU_NO_CACHE=1 or override the location with
JAX_COMPILATION_CACHE_DIR.
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger(__name__)

_done = False


def enable_persistent_cache() -> None:
    """Idempotent; call before the first jit compilation."""
    global _done
    if _done:
        return
    _done = True
    if os.environ.get("GENOMIC_PCA_TPU_NO_CACHE") == "1":
        return
    import jax

    if jax.config.jax_compilation_cache_dir or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR"
    ):
        return  # user already configured one
    cache_dir = os.path.expanduser("~/.cache/genomic_pca_tpu/jax")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Persist EVERYTHING: on remote-compile backends even a
        # 0.3 s program costs a full compile round-trip per process,
        # and the cold path is a dozen such programs.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        log.debug("Persistent compilation cache at %s", cache_dir)
    except (OSError, AttributeError) as e:  # read-only FS / old jax
        log.info("Could not enable persistent compilation cache: %s", e)

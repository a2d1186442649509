"""Deterministic PRNG derivation.

The reference threads explicit u64 seeds (`--rfit-seed`, `--eigensnp-seed`,
/root/reference/src/main.rs:528-529, 581-582) into ChaCha-based RNGs.  Here
every random draw derives from `jax.random.key(seed)` through a documented
fold-in order so the same seed reproduces identical PCs at any mesh size:

    root = key(seed)
    stage key   = fold_in(root, STAGE_ID[stage])
    per-unit    = fold_in(stage_key, unit_index)   # e.g. LD-block index

Reduction orders in the algorithms are fixed (shard index order), which
together with this scheme gives run-to-run determinism.
"""

from __future__ import annotations

import jax

# Stable stage identifiers — appending is fine, re-ordering is a breaking
# change to reproducibility.
STAGE_IDS = {
    "rfit_sketch": 0,
    "eigensnp_sample_subset": 1,
    "eigensnp_local_sketch": 2,
    "eigensnp_global_sketch": 3,
    "synthetic_data": 4,
    "bench": 5,
    "eigensnp_refine_fill": 6,
}


def key_for_stage(seed: int, stage: str, unit: int = 0) -> jax.Array:
    root = jax.random.key(seed)
    k = jax.random.fold_in(root, STAGE_IDS[stage])
    if unit:
        k = jax.random.fold_in(k, unit)
    return k

"""EigenSNP two-stage PCA: per-LD-block local bases -> condensed global
eigensolve -> streamed refinement.

Re-creation of `efficient_pca::eigensnp::EigenSNPCoreAlgorithm`, whose
contract is characterized from its call sites and config
(/root/reference/src/main.rs:311-327, 359-366; SURVEY §2.4):

  Stage 1 — for each LD block, learn a local SNP basis by randomized SVD
  of the standardized block restricted to a deterministic sample subset
  (subset_factor x N clamped to [min,max], main.rs:314-316), with
  `components_per_block` components and local oversampling / power
  iterations.

  Stage 2 — project ALL samples through every block basis, stack the
  condensed (sum_b c_b) x N feature matrix, and run a global randomized
  PCA (global oversampling / power iterations) for `k_global` PCs.

  Refinement — `refine_passes` subspace-iteration passes over the FULL
  standardized matrix, streamed in `snp_strip_size` strips
  (the reference streams loadings/score re-estimation the same way);
  a final small eigensolve extracts scores, eigenvalues and loadings.

TPU mapping: every stage is MXU matmuls over static-shaped blocks (ragged
LD blocks are zero-padded to coarse row buckets so XLA compiles a handful
of kernel shapes, not one per block — padded rows standardize to zero and
drop out of the math).  The refinement operates on the StripedMatrix
engine, so it shards over the variant axis unchanged (parallel/).
"""

from __future__ import annotations

import dataclasses
import functools
import logging
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from genomic_pca_tpu.config import EigenSnpConfig
from genomic_pca_tpu.errors import ComputeError
from genomic_pca_tpu.models.prepare import PreparedData
from genomic_pca_tpu.ops.rsvd import rsvd
from genomic_pca_tpu.utils.rng import key_for_stage

log = logging.getLogger(__name__)


@dataclasses.dataclass
class EigenSnpResult:
    """Equivalent of `EigenSNPCoreOutput` (main.rs:389-407)."""

    scores: np.ndarray  # (N, K) f32 final sample PC scores
    eigenvalues: np.ndarray  # (K,) f64
    loadings: np.ndarray  # (D, K) f32 per-SNP loadings
    diagnostics: Optional[Dict] = None


def _bucket_rows(d: int, bucket: int = 512) -> int:
    """Next bucket multiple >= d (caps the number of compiled shapes)."""
    return max(bucket, ((d + bucket - 1) // bucket) * bucket)


@jax.jit
def _project_blocks_batched(u: jax.Array, x: jax.Array) -> jax.Array:
    """Batched U_b^T X_b: (B, bucket, c) x (B, bucket, N) -> (B, c, N)."""
    return jax.lax.dot_general(
        u, x,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.lru_cache(maxsize=None)
def _batched_rsvd(k: int, n_oversamples: int, n_power_iter: int):
    """jitted vmap of rsvd over a stacked batch of same-shape blocks."""

    def one(x, key):
        return rsvd(
            x, key, k=k, n_oversamples=n_oversamples, n_power_iter=n_power_iter
        )

    return jax.jit(jax.vmap(one))


def _pow2_at_most(x: int) -> int:
    p = 1
    while p * 2 <= x:
        p *= 2
    return p


def _choose_sample_subset(cfg: EigenSnpConfig, n_samples: int) -> np.ndarray:
    """Deterministic sample subset for local basis learning (sorted)."""
    n_subset = cfg.subset_size(n_samples)
    if n_subset >= n_samples:
        return np.arange(n_samples, dtype=np.int64)
    key = key_for_stage(cfg.seed, "eigensnp_sample_subset")
    perm = np.asarray(jax.random.permutation(key, n_samples))
    return np.sort(perm[:n_subset]).astype(np.int64)


def compute_eigensnp_pca(
    prep: PreparedData,
    cfg: EigenSnpConfig,
    strip_size: Optional[int] = None,
    checkpoint_dir: Optional[str] = None,
) -> EigenSnpResult:
    """Run the full two-stage pipeline on prepared data.

    `checkpoint_dir` enables stage checkpoint/resume for preemptible
    runs (utils/checkpoint.py — capability absent in the reference).
    """
    from genomic_pca_tpu.utils.checkpoint import StageCheckpointer, fingerprint

    n = prep.n_samples
    d = prep.n_pca_snps
    if d == 0 or not prep.blocks:
        raise ComputeError("No PCA SNPs / LD blocks available for EigenSNP.")
    k = min(cfg.k_global, max(n - 1, 1), d)
    strip_size = strip_size or cfg.snp_strip_size

    ckpt = StageCheckpointer(
        checkpoint_dir,
        fingerprint(cfg, n, d, [b.tag for b in prep.blocks]),
    )

    diag: Optional[Dict] = {"blocks": []} if cfg.collect_diagnostics else None
    import time as _time

    _t_stage = _time.perf_counter()

    # ---- Stage 1: local bases on the sample subset -------------------
    subset = _choose_sample_subset(cfg, n)
    local_bases: List[np.ndarray] = []  # U_b, (d_b, c_b) each
    saved = ckpt.load("stage1_bases")
    if saved is not None and len(saved) == len(prep.blocks):
        local_bases = [saved[f"block_{i}"] for i in range(len(prep.blocks))]
    else:
        log.info(
            "EigenSNP stage 1: %d blocks, sample subset %d / %d.",
            len(prep.blocks),
            len(subset),
            n,
        )
        # Group blocks by (padded-bucket, c_b) and run each group through a
        # vmapped randomized SVD — one device dispatch per batch instead of
        # one per block (genome-wide runs have ~1,400 blocks; per-block
        # dispatch latency would dominate).  Padded rows are exactly zero,
        # so U keeps exact zero rows there and the padded bases flow
        # through stage 2 unchanged; batch-padding slots use zero blocks
        # whose outputs are discarded.
        groups: Dict[tuple, List[int]] = {}
        for b_idx, block in enumerate(prep.blocks):
            d_b = len(block.pca_snp_ids)
            c_b = min(cfg.components_per_block, d_b, len(subset))
            groups.setdefault((_bucket_rows(d_b), c_b), []).append(b_idx)

        # ~1 GB of f32 per staged batch
        budget_elems = 256 * 1024 * 1024
        results: Dict[int, np.ndarray] = {}
        svals: Dict[int, np.ndarray] = {}
        for (bucket, c_b), idxs in sorted(groups.items()):
            b_cap = max(1, budget_elems // (bucket * max(len(subset), 1)))
            chunk_b = _pow2_at_most(min(b_cap, max(len(idxs), 1)))
            fn = _batched_rsvd(
                c_b, cfg.local_oversampling, cfg.local_power_iter
            )
            for pos in range(0, len(idxs), chunk_b):
                chunk = idxs[pos : pos + chunk_b]
                xs = [
                    prep.fetch_block_standardized(
                        prep.blocks[i].pca_snp_ids, subset, pad_rows_to=bucket
                    )
                    for i in chunk
                ]
                while len(xs) < chunk_b:  # batch padding: inert zero blocks
                    xs.append(np.zeros_like(xs[0]))
                keys = jnp.stack(
                    [
                        key_for_stage(
                            cfg.seed, "eigensnp_local_sketch", unit=i + 1
                        )
                        for i in chunk
                    ]
                    + [
                        key_for_stage(cfg.seed, "eigensnp_local_sketch", unit=0)
                    ]
                    * (chunk_b - len(chunk))
                )
                u_batch, s_batch, _ = fn(jnp.asarray(np.stack(xs)), keys)
                u_batch = np.asarray(u_batch)
                s_batch = np.asarray(s_batch)
                for j, i in enumerate(chunk):
                    results[i] = u_batch[j]
                    svals[i] = s_batch[j]

        local_bases = [results[i] for i in range(len(prep.blocks))]
        if diag is not None:
            for b_idx, block in enumerate(prep.blocks):
                d_b = len(block.pca_snp_ids)
                diag["blocks"].append(
                    {
                        "tag": block.tag,
                        "num_snps": int(d_b),
                        "num_local_components": int(
                            min(cfg.components_per_block, d_b, len(subset))
                        ),
                        "local_singular_values": svals[b_idx].tolist(),
                    }
                )
        ckpt.save(
            "stage1_bases",
            {f"block_{i}": u for i, u in enumerate(local_bases)},
        )

    log.info("EigenSNP stage 1 done in %.1fs.", _time.perf_counter() - _t_stage)
    _t_stage = _time.perf_counter()

    # ---- Stage 2: condensed projection + global PCA ------------------
    # Batched like stage 1: group blocks by (bucket, c_b) and project all
    # samples through the local bases with one batched dot per chunk.
    proj_groups: Dict[tuple, List[int]] = {}
    for b_idx, u_b in enumerate(local_bases):
        proj_groups.setdefault((u_b.shape[0], u_b.shape[1]), []).append(b_idx)

    budget_elems = 256 * 1024 * 1024
    condensed_by_block: Dict[int, jax.Array] = {}
    for (bucket, c_b), idxs in sorted(proj_groups.items()):
        b_cap = max(1, budget_elems // (bucket * max(n, 1)))
        chunk_b = _pow2_at_most(min(b_cap, max(len(idxs), 1)))
        for pos in range(0, len(idxs), chunk_b):
            chunk = idxs[pos : pos + chunk_b]
            xs = [
                prep.fetch_block_standardized(
                    prep.blocks[i].pca_snp_ids, pad_rows_to=bucket
                )
                for i in chunk
            ]
            us = [local_bases[i] for i in chunk]
            while len(xs) < chunk_b:
                xs.append(np.zeros_like(xs[0]))
                us.append(np.zeros_like(us[0]))
            out = _project_blocks_batched(
                jnp.asarray(np.stack(us)), jnp.asarray(np.stack(xs))
            )  # (B, c_b, N)
            for j, i in enumerate(chunk):
                condensed_by_block[i] = out[j]
    y = jnp.concatenate(
        [condensed_by_block[i] for i in range(len(prep.blocks))], axis=0
    )  # (C_total, N)
    log.info("EigenSNP stage 2: condensed matrix %s.", tuple(y.shape))

    c_total = int(y.shape[0])
    if c_total < k:
        log.warning(
            "Condensed feature rank %d < requested k_global %d; "
            "returning %d components (raise components_per_block or add "
            "LD blocks for more).",
            c_total,
            k,
            c_total,
        )
        k = c_total

    saved = ckpt.load("stage2_basis")
    if saved is not None:
        s_basis = jnp.asarray(saved["s_basis"])
    else:
        gkey = key_for_stage(cfg.seed, "eigensnp_global_sketch")
        _, _, vt_g = rsvd(
            y,
            gkey,
            k=k,
            n_oversamples=cfg.global_oversampling,
            n_power_iter=cfg.global_power_iter,
        )
        s_basis, _ = jnp.linalg.qr(vt_g.T)  # (N, k) orthonormal score basis
        ckpt.save("stage2_basis", {"s_basis": np.asarray(s_basis)})

    log.info(
        "EigenSNP stage 2 + global PCA done in %.1fs.",
        _time.perf_counter() - _t_stage,
    )
    _t_stage = _time.perf_counter()

    # ---- Refinement + final eigensolve + loadings --------------------
    # The refinement is subspace iteration seeded with the stage-2 basis —
    # exactly the fused single-program PCA core (power loop -> condensed
    # eigensolve -> loadings in ONE compile/dispatch).  Streamed/striped
    # containers without pca_core fall back to per-pass dispatches with
    # per-pass checkpointing.
    a = prep.load_matrix(strip_size=strip_size)
    if hasattr(a, "pca_core") and not ckpt.enabled and cfg.refine_passes >= 1:
        v_k, sigma_k, evals_k, loadings = a.pca_core(
            s_basis, cfg.refine_passes, k
        )
        scores = np.asarray(v_k * sigma_k[None, :], dtype=np.float32)
        loadings = loadings.astype(np.float32)
        eigenvalues = np.asarray(evals_k, dtype=np.float64) / max(n - 1, 1)
        sigma = sigma_k
    else:
        start_pass = 0
        for p in reversed(range(cfg.refine_passes)):
            saved = ckpt.load(f"refine_pass_{p}")
            if saved is not None:
                s_basis = jnp.asarray(saved["s_basis"])
                start_pass = p + 1
                break
        for p in range(start_pass, cfg.refine_passes):
            t = a.gram_apply(s_basis)  # A^T A S, one streamed pass
            s_basis, _ = jnp.linalg.qr(t)
            ckpt.save(f"refine_pass_{p}", {"s_basis": np.asarray(s_basis)})
            log.info(
                "EigenSNP refinement pass %d/%d done.", p + 1, cfg.refine_passes
            )

        g = a.tsq_accumulate(s_basis)  # (k, k)
        evals, w = jnp.linalg.eigh(g)
        order = jnp.argsort(-evals)
        evals = jnp.maximum(evals[order], 0.0)
        w = w[:, order]
        sigma = jnp.sqrt(evals)
        v = s_basis @ w  # (N, k) right singular vectors of A

        scores = np.asarray(v * sigma[None, :], dtype=np.float32)
        inv_sigma = np.asarray(
            jnp.where(sigma > 0, 1.0 / jnp.where(sigma > 0, sigma, 1.0), 0.0)
        )
        loadings = (a.right_apply(v) * inv_sigma[None, :]).astype(np.float32)
        eigenvalues = np.asarray(evals, dtype=np.float64) / max(n - 1, 1)

    log.info(
        "EigenSNP refinement + finalization done in %.1fs.",
        _time.perf_counter() - _t_stage,
    )

    if diag is not None:
        diag["global"] = {
            "condensed_features": int(y.shape[0]),
            "k_global": int(k),
            "refine_passes": int(cfg.refine_passes),
            "singular_values": np.asarray(sigma).tolist(),
        }
        diag["num_pca_snps"] = int(d)
        diag["num_qc_samples"] = int(n)

    return EigenSnpResult(
        scores=scores,
        eigenvalues=eigenvalues,
        loadings=loadings,
        diagnostics=diag,
    )

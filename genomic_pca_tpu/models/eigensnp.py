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
def _project_block(u_b: jax.Array, x_all: jax.Array) -> jax.Array:
    """U_b^T X_b on the MXU with pinned f32 precision: (c_b, N)."""
    return jnp.dot(
        u_b.T, x_all, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


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
        for b_idx, block in enumerate(prep.blocks):
            d_b = len(block.pca_snp_ids)
            c_b = min(cfg.components_per_block, d_b, len(subset))
            # Pad ragged blocks to bucketed shapes: the padded rows are
            # exactly zero, so U keeps exact zero rows there and the
            # padded basis can flow through stage 2 unchanged.
            x_sub = prep.fetch_block_standardized(
                block.pca_snp_ids, subset, pad_rows_to=_bucket_rows(d_b)
            )
            key = key_for_stage(cfg.seed, "eigensnp_local_sketch", unit=b_idx + 1)
            u_b, s_b, _ = rsvd(
                x_sub,
                key,
                k=c_b,
                n_oversamples=cfg.local_oversampling,
                n_power_iter=cfg.local_power_iter,
            )
            local_bases.append(np.asarray(u_b))  # (bucket(d_b), c_b)
            if diag is not None:
                diag["blocks"].append(
                    {
                        "tag": block.tag,
                        "num_snps": int(d_b),
                        "num_local_components": int(c_b),
                        "local_singular_values": np.asarray(s_b).tolist(),
                    }
                )
        ckpt.save(
            "stage1_bases",
            {f"block_{i}": u for i, u in enumerate(local_bases)},
        )

    # ---- Stage 2: condensed projection + global PCA ------------------
    condensed: List[jax.Array] = []
    for block, u_b in zip(prep.blocks, local_bases):
        x_all = prep.fetch_block_standardized(
            block.pca_snp_ids, pad_rows_to=u_b.shape[0]
        )  # (bucket(d_b), N); padded rows are zero on both sides
        condensed.append(_project_block(jnp.asarray(u_b), x_all))  # (c_b, N)
    y = jnp.concatenate(condensed, axis=0)  # (C_total, N)
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

    # ---- Refinement over the full standardized matrix ----------------
    a = prep.load_matrix(strip_size=strip_size)
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
        log.info("EigenSNP refinement pass %d/%d done.", p + 1, cfg.refine_passes)

    # ---- Final small eigensolve + loadings ---------------------------
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

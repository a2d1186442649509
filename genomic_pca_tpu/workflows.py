"""Workflow orchestration: VCF and EigenSNP end-to-end runs.

Equivalents of `run_vcf_workflow` (/root/reference/src/main.rs:133-247)
and `run_eigensnp_rust_workflow` (main.rs:250-447), including per-stage
wall-clock timing summaries (main.rs:237-243, 434-442).
"""

from __future__ import annotations

import json
import logging

from typing import Optional

import jax
import numpy as np


from genomic_pca_tpu.config import (
    DataPrepConfig, EigenSnpConfig, RsvdConfig,
)
from genomic_pca_tpu.io.vcf import load_vcf_directory
from genomic_pca_tpu.io.writers import (
    write_eigenvalues,
    write_loadings,
    write_principal_components,
)
from genomic_pca_tpu.models.eigensnp import compute_eigensnp_pca
from genomic_pca_tpu.models.pca import streamed_pca
from genomic_pca_tpu.models.prepare import prepare_data
from genomic_pca_tpu.parallel.sharded import ShardedMatrix
from genomic_pca_tpu.utils.jaxcache import enable_persistent_cache
from genomic_pca_tpu.utils.system import preflight
from genomic_pca_tpu.utils.timing import StageTimer
from genomic_pca_tpu.utils.warmup import (
    process_count_nodevice,
    warm_backend_async,
)

log = logging.getLogger(__name__)


def run_vcf_workflow(
    vcf_dir: str,
    output_prefix: str,
    k: int,
    maf: Optional[float] = None,
    rfit_seed: Optional[int] = None,
    rfit_tolerance: Optional[float] = None,
    threads: int = 0,
    write_real_eigenvalues: bool = True,
) -> None:
    """VCF directory -> dosage matrix -> randomized PCA -> TSVs.

    Output files: `{prefix}.vcf.pca.tsv` and `{prefix}.eigenvalues.tsv`.
    The reference leaves eigenvalues.tsv header-only in this mode (its
    pc_variances vector is empty, main.rs:676); we write the actual
    explained variances by default — a strict superset of the reference
    format (`write_real_eigenvalues=False` restores exact parity).
    Loadings are intentionally not written in VCF mode (main.rs:233).
    """
    timer = StageTimer()
    enable_persistent_cache()
    warm_backend_async()  # hide the one-time backend init under parsing
    n_proc = process_count_nodevice()

    with timer.stage("VCF parsing & filtering"):
        if n_proc == 1:
            sample_names, variant_ids, strips = load_vcf_directory(
                vcf_dir, maf, n_workers=threads
            )
        else:
            # Per-host file sharding: each process parses ONLY its own
            # files (round-robin by sorted index) — the distributed form
            # of the reference's rayon par_iter over files
            # (/root/reference/src/main.rs:171-179, SURVEY §2.3 row 1).
            from genomic_pca_tpu.io.vcf import load_vcf_directory_sharded

            sample_names, n_files, owned_blocks = load_vcf_directory_sharded(
                vcf_dir, maf, jax.process_index(), n_proc, n_workers=threads
            )

    with timer.stage("Matrix assembly (device strips)"):
        # Pack dosages to the 2-bit device format (4x less upload and
        # HBM; VCF mode drops any variant with a missing GT, so the
        # codes are always clean).  Moments mirror from_arrays: exact
        # integer histograms, center-without-scale (tests/pca.py:109
        # semantics).
        from genomic_pca_tpu.ops.qc import (
            dosage_mean_from_counts, genotype_counts_int8_host,
        )
        from genomic_pca_tpu.parallel.sharded import pack_int8_rows

        n_samples = len(sample_names)
        # The parsing stage partitioned files by the no-device process
        # count; the device ops below materialize the backend anyway, so
        # re-validate against the REAL count first (a multi-host PJRT
        # runtime without jax.distributed would otherwise ingest every
        # file on every host while the array layer shards by the real
        # count — duplicated variants, corrupted eigenvalues).
        from genomic_pca_tpu.utils.warmup import (
            assert_process_count_consistent,
        )

        assert_process_count_consistent(n_proc)
        if n_proc == 1:
            packed_parts: list = []
            mean_parts: list = []
            for g in strips:
                g = np.asarray(g, dtype=np.int8)
                m = dosage_mean_from_counts(genotype_counts_int8_host(g))
                mean_parts.append(m.astype(np.float32))
                packed_parts.append(pack_int8_rows(g))
            bps = max(-(-n_samples // 4), 1)
            packed_all = (
                np.concatenate(packed_parts)
                if packed_parts
                else np.zeros((0, bps), dtype=np.uint8)
            )
            means = (
                np.concatenate(mean_parts)
                if mean_parts
                else np.zeros(0, dtype=np.float32)
            )
            matrix = ShardedMatrix.from_packed_strips(
                lambda lo, hi: packed_all[lo:hi],
                n_rows=packed_all.shape[0],
                mean=means,
                std=np.ones_like(means),
                n_samples=n_samples,
            )
        else:
            # Exchange per-file variant counts (the only cross-host
            # metadata), then assemble the global array with each file's
            # rows living on the process that parsed it — genotypes
            # never transit through a single host.
            from jax.experimental import multihost_utils

            local_counts = np.zeros(n_files, dtype=np.int64)
            for fi, blk in owned_blocks.items():
                local_counts[fi] = blk.dosages.shape[0]
            counts = np.asarray(
                multihost_utils.process_allgather(local_counts)
            ).sum(axis=0)
            if int(counts.sum()) == 0:
                from genomic_pca_tpu.errors import VcfParseError

                raise VcfParseError(
                    "No variants passed filters across all VCF files."
                )
            owner = np.arange(n_files, dtype=np.int64) % n_proc
            local_units = {}
            for fi, blk in owned_blocks.items():
                g = np.asarray(blk.dosages, dtype=np.int8)
                m = dosage_mean_from_counts(genotype_counts_int8_host(g))
                local_units[fi] = (
                    pack_int8_rows(g), m.astype(np.float32), None
                )
            matrix = ShardedMatrix.from_owned_units(
                counts,
                owner,
                local_units,
                n_samples=n_samples,
                packed=True,
                center_only=True,
            )
    log.info(
        "Assembled %d variants x %d samples (padded to %d x %d, %d-way sharded).",
        matrix.n_rows,
        matrix.n_samples,
        matrix.d_pad,
        matrix.n_pad,
        matrix.mesh.devices.size,
    )

    with timer.stage("Randomized PCA (rfit)"):
        # RsvdConfig is the single authority for the rfit contract
        # (k, n_oversamples=10 per main.rs:651, seed, tolerance).
        rs = RsvdConfig(k=k, seed=rfit_seed, tolerance=rfit_tolerance)
        result = streamed_pca(
            matrix,
            k=rs.k,
            n_oversamples=rs.n_oversamples,
            n_power_iter=rs.n_power_iter,
            seed=rs.seed,
            tolerance=rs.tolerance,
        )

    with timer.stage("Output writing"):
        # SPMD multi-process: every process computes, only process 0
        # touches the (shared) filesystem.
        if jax.process_index() == 0:
            write_principal_components(
                output_prefix, sample_names, result.scores, suffix="vcf.pca.tsv"
            )
            write_eigenvalues(
                output_prefix, result.eigenvalues if write_real_eigenvalues else []
            )

    timer.log_summary("VCF workflow stage timings")


def run_eigensnp_workflow(
    prep_config: DataPrepConfig,
    algo_config: EigenSnpConfig,
    output_prefix: str,
    checkpoint_dir: Optional[str] = None,
    write_moments: bool = False,
    compile_only: bool = False,
    stop_after_checkpoint: Optional[str] = None,
) -> None:
    """BED/LD-block -> QC -> two-stage EigenSNP PCA -> TSVs.

    Output files: `{prefix}.eigensnp.pca.tsv`, `{prefix}.eigenvalues.tsv`,
    `{prefix}.eigensnp.loadings.tsv`, and with diagnostics enabled
    `{prefix}.eigensnp_diagnostics.json` (main.rs:386-432).

    `compile_only` seeds the persistent compilation cache for this
    (fileset shape, config) without running the algorithm or writing
    outputs — an install-/first-run-time warmer that makes the next
    real run start with a fully warm cache.
    """
    timer = StageTimer()
    enable_persistent_cache()
    warm_backend_async()  # hide the one-time backend init under QC
    preflight(planned_threads=16)

    with timer.stage("Data preparation (QC + LD mapping)"):
        prep = prepare_data(prep_config)

    with timer.stage("EigenSNP core algorithm"):
        result = compute_eigensnp_pca(
            prep, algo_config, checkpoint_dir=checkpoint_dir,
            compile_only=compile_only,
            stop_after_checkpoint=stop_after_checkpoint,
        )
    if compile_only or (stop_after_checkpoint is not None and result is None):
        timer.log_summary(
            "EigenSNP compile-only stage timings" if compile_only
            else "EigenSNP partial-run stage timings (stopped after "
                 f"checkpoint {stop_after_checkpoint!r})"
        )
        return

    with timer.stage("Output writing"):
        # SPMD multi-process: every process computes, only process 0
        # touches the (shared) filesystem.
        if jax.process_index() == 0:
            write_principal_components(
                output_prefix, prep.sample_ids, result.scores,
                suffix="eigensnp.pca.tsv",
            )
            write_eigenvalues(output_prefix, result.eigenvalues)
            sids, chroms, positions = prep.snp_metadata()
            write_loadings(
                output_prefix,
                [str(s) for s in sids],
                [str(c) for c in chroms],
                [int(p) for p in positions],
                result.loadings,
            )
            if write_moments:
                from genomic_pca_tpu.io.writers import write_moments as _wm

                idx = prep.pca_snp_orig_indices
                _wm(
                    output_prefix,
                    [str(s) for s in sids],
                    prep.mean,
                    prep.std,
                    [str(x) for x in prep.bed.bim.a1[idx]],
                    [str(x) for x in prep.bed.bim.a2[idx]],
                )
            if result.diagnostics is not None:
                path = f"{output_prefix}.eigensnp_diagnostics.json"
                with open(path, "w") as fh:
                    json.dump(result.diagnostics, fh, indent=2)
                log.info("Wrote diagnostics to %s", path)

    timer.log_summary("EigenSNP workflow stage timings")


def run_projection_workflow(
    bed_path: str,
    loadings_path: str,
    moments_path: str,
    output_prefix: str,
    projection_strip_rows: int = 262_144,
    projection_strip_bytes: int = 1 << 29,  # 512 MB host decode per strip
) -> None:
    """Project NEW samples into a previously fitted PC space.

    New capability over the reference (whose `PCA::transform`,
    /root/reference/src/main.rs:659-660, is in-process only and has no
    CLI): loads the fitted loadings + training moments TSVs, matches the
    model's SNPs against the new PLINK fileset by VariantID, and runs
    the device projection (`models/pca.transform_device`).  Missing
    genotypes in the new data impute to the TRAINING mean.  Output:
    `{prefix}.projected.pca.tsv` (same schema as the score writers).
    """
    from genomic_pca_tpu.errors import DataPrepError
    from genomic_pca_tpu.io.bed import BedReader
    from genomic_pca_tpu.io.writers import read_loadings, read_moments
    from genomic_pca_tpu.models.pca import StripProjector

    timer = StageTimer()
    enable_persistent_cache()
    warm_backend_async()

    def _require_single_process(count: int) -> None:
        if count > 1:
            raise DataPrepError(
                "--project is a single-process operation (the model is "
                "k columns; there is nothing to shard across hosts) — "
                "run it on one process."
            )

    # Fast-fail when a multi-controller runtime already exists; a
    # multi-host PJRT pod without jax.distributed is only detectable
    # once the backend initializes, so the check repeats with the real
    # count right before the device stage below.
    _require_single_process(process_count_nodevice())

    with timer.stage("Model loading (loadings + moments)"):
        l_ids, loadings = read_loadings(loadings_path)
        m_ids, m_a1, m_a2, means, stds = read_moments(moments_path)
        if l_ids != m_ids:
            raise DataPrepError(
                "Loadings and moments TSVs disagree on the SNP set "
                f"({len(l_ids)} vs {len(m_ids)} variants or different "
                "order); both must come from the same fit."
            )

    with timer.stage("New-sample genotype matching"):
        bed = BedReader(bed_path)
        from collections import Counter

        counts = Counter(bed.bim.sid)
        dups = [vid for vid in l_ids if counts.get(vid, 0) > 1]
        if dups:
            raise DataPrepError(
                f"{len(dups)} model SNPs appear more than once in "
                f"{bed_path}'s BIM (first: {dups[:3]}); VariantID matching "
                "is ambiguous — deduplicate the new fileset first."
            )
        pos_of = {sid: i for i, sid in enumerate(bed.bim.sid)}
        missing = [vid for vid in l_ids if vid not in pos_of]
        if missing:
            raise DataPrepError(
                f"{len(missing)} / {len(l_ids)} model SNPs absent from "
                f"{bed_path} (first: {missing[:3]}); projection requires "
                "every fitted SNP in the new fileset."
            )
        rows = np.asarray([pos_of[vid] for vid in l_ids], dtype=np.int64)
        # Allele-orientation check: a swapped A1/A2 encodes
        # dosage' = 2 - dosage; projecting through it would silently
        # flip the SNP's contribution.
        new_a1 = bed.bim.a1[rows]
        new_a2 = bed.bim.a2[rows]
        bad = [
            l_ids[j]
            for j in range(len(l_ids))
            if str(new_a1[j]) != m_a1[j] or str(new_a2[j]) != m_a2[j]
        ]
        if bad:
            raise DataPrepError(
                f"{len(bad)} model SNPs have a different A1/A2 "
                f"orientation in {bed_path} (first: {bad[:3]}); harmonize "
                "alleles (swap/flip) before projecting — a swapped "
                "orientation encodes dosage' = 2 - dosage and would "
                "corrupt the scores silently."
            )
    with timer.stage("Device projection (strip-chunked)"):
        import jax as _jax

        _require_single_process(_jax.process_count())
        # Projection is linear in SNP rows, so stream the new BED in
        # strips and sum the per-strip device projections — the host
        # never materializes the full (D, N_new) decode (a multi-GB
        # cliff at genome scale), and each strip's standardize+matmul
        # runs on device with the TRAINING moments.  The strip size
        # bounds HOST BYTES (rows x n_new int8), so it scales down with
        # wide new cohorts; the next strip decodes on a background
        # thread while the device projects the current one.
        n_new = bed.n_samples
        all_samples = np.arange(n_new, dtype=np.int64)
        scores = np.zeros((n_new, loadings.shape[1]), dtype=np.float32)
        strip = max(
            1024,
            min(
                projection_strip_rows,
                projection_strip_bytes // max(n_new, 1),
            ),
        )
        from concurrent.futures import ThreadPoolExecutor

        bounds = [
            (lo, min(lo + strip, len(rows)))
            for lo in range(0, len(rows), strip)
        ]
        # ONE compiled projection program for every strip (the tail
        # strip pads to the common shape with inert rows) — per-strip
        # transform_device would re-trace/recompile each iteration.
        project = StripProjector(strip, n_new, loadings.shape[1])
        with ThreadPoolExecutor(1) as ex:
            nxt = ex.submit(bed.read, rows[bounds[0][0]:bounds[0][1]],
                            all_samples)
            for i, (lo, hi) in enumerate(bounds):
                g_strip = nxt.result()
                if i + 1 < len(bounds):
                    lo2, hi2 = bounds[i + 1]
                    nxt = ex.submit(bed.read, rows[lo2:hi2], all_samples)
                scores += project(
                    g_strip, loadings[lo:hi], means[lo:hi], stds[lo:hi]
                )

    with timer.stage("Output writing"):
        if jax.process_index() == 0:
            write_principal_components(
                output_prefix,
                list(bed.fam.iid),
                scores,
                suffix="projected.pca.tsv",
            )

    timer.log_summary("Projection workflow stage timings")

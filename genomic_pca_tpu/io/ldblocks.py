"""LD-block definition file parsing and SNP -> block mapping.

Semantics match the reference exactly
(/root/reference/src/prepare.rs:1424-1616):

* File format: whitespace-separated `chr start end` (>=3 fields); lines
  that are empty, start with `#`, `chr\t`, or `chromosome\t` are skipped;
  malformed (<3 fields) lines are warned and skipped; unparsable
  coordinates are errors.
* Chromosome names are normalized by lowercasing and stripping a leading
  "chr" (prepare.rs:1610-1616).
* Block IDs are auto-generated as `chr:start-end` (prepare.rs:1597).
* Each QC'd SNP maps to the FIRST block (in file order) containing it,
  inclusive on both ends (prepare.rs:1447-1463).
* The PCA SNP index space is the sorted set of blocked SNPs (dense
  re-index by original BIM order, prepare.rs:1465-1486); per-block SNP
  lists are sorted and blocks are ordered by tag (prepare.rs:1526-1549).
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Dict, List, Sequence, Tuple

import numpy as np

log = logging.getLogger(__name__)


@dataclasses.dataclass
class LdBlockSpec:
    """Equivalent of `LdBlockSpecification` (prepare.rs:1540-1543)."""

    tag: str
    pca_snp_ids: np.ndarray  # sorted dense PCA SNP ids in this block


def normalize_chromosome_name(name: str) -> str:
    name = name.lower()
    if name.startswith("chr"):
        name = name[3:]
    return name


def parse_ld_block_file(path: str) -> List[Tuple[str, int, int, str]]:
    """Returns [(normalized_chr, start, end, auto_tag)] in file order."""
    blocks: List[Tuple[str, int, int, str]] = []
    with open(path, "r") as fh:
        for line_num, line in enumerate(fh, start=1):
            trimmed = line.strip()
            if (
                not trimmed
                or trimmed.startswith("#")
                or trimmed.startswith("chr\t")
                or trimmed.startswith("chromosome\t")
            ):
                continue
            parts = trimmed.split()
            if len(parts) < 3:
                log.warning(
                    "Skipping malformed LD block line %d: %r "
                    "(expected at least 3 fields: chr start end)",
                    line_num,
                    line,
                )
                continue
            chrom = normalize_chromosome_name(parts[0])
            try:
                start = int(parts[1])
                end = int(parts[2])
            except ValueError as e:
                raise ValueError(
                    f"LD block line {line_num}: error parsing coordinates: {e}"
                ) from e
            blocks.append((chrom, start, end, f"{chrom}:{start}-{end}"))
    if not blocks:
        log.warning("No valid LD blocks parsed from file: %s", path)
    else:
        log.info("Parsed %d LD blocks (IDs auto-generated).", len(blocks))
    return blocks


def map_snps_to_blocks(
    snp_chroms: Sequence[str],
    snp_positions: Sequence[int],
    snp_original_indices: Sequence[int],
    parsed_blocks: List[Tuple[str, int, int, str]],
) -> Tuple[List[LdBlockSpec], np.ndarray]:
    """Map QC'd SNPs to LD blocks; returns (blocks, pca_snp_original_indices).

    The returned original-index array defines the dense PcaSnpId space
    (position i <-> PcaSnpId i); blocks reference that space and come
    sorted by tag.  SNPs contained in no block are excluded from PCA.
    """
    # Bucket blocks by chromosome, preserving file order for
    # first-containing-block semantics.
    by_chrom: Dict[str, List[Tuple[int, int, str]]] = {}
    for chrom, start, end, tag in parsed_blocks:
        by_chrom.setdefault(chrom, []).append((start, end, tag))

    tag_to_orig: Dict[str, List[int]] = {}
    blocked_orig: set = set()
    for chrom, pos, orig in zip(snp_chroms, snp_positions, snp_original_indices):
        norm = normalize_chromosome_name(str(chrom))
        for start, end, tag in by_chrom.get(norm, ()):
            if start <= pos <= end:
                tag_to_orig.setdefault(tag, []).append(orig)
                blocked_orig.add(orig)
                break

    pca_orig = np.array(sorted(blocked_orig), dtype=np.int64)
    if len(pca_orig) == 0:
        log.warning("No SNPs mapped to any LD blocks after filtering.")
        return [], pca_orig

    orig_to_pca = {int(o): i for i, o in enumerate(pca_orig)}
    specs = [
        LdBlockSpec(
            tag=tag,
            pca_snp_ids=np.array(
                sorted(orig_to_pca[o] for o in origs), dtype=np.int64
            ),
        )
        for tag, origs in tag_to_orig.items()
    ]
    specs.sort(key=lambda s: s.tag)
    return specs, pca_orig

"""genomic_pca_tpu — TPU-native genomic PCA framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
SauersML/genomic_pca reference tool (Rust CLI, reference at
/root/reference/src/main.rs:80-130):

* **VCF workflow** — parse a directory of VCF/VCF.GZ files into a dense
  dosage matrix and run randomized-SVD PCA
  (reference: src/main.rs:133-247, src/vcf.rs).
* **EigenSNP workflow** — stream a PLINK BED fileset through QC +
  standardization and run the two-stage LD-block-local → global PCA
  (reference: src/main.rs:250-447, src/prepare.rs).

Compute is JAX-first: int8 dosage strips live on device, QC reductions /
standardize-matmuls are jitted XLA programs (Pallas kernels on the hot
path), and the variant axis shards across a `jax.sharding.Mesh` with
`psum`-merged Gram/sketch contributions for multi-chip scale.
"""

__version__ = "0.1.0"

from genomic_pca_tpu.config import (  # noqa: F401
    DataPrepConfig,
    EigenSnpConfig,
    RsvdConfig,
)

from genomic_pca_tpu.ops.qc import genotype_counts, snp_qc_from_counts, QcResult  # noqa: F401
from genomic_pca_tpu.ops.hwe import hwe_chi2_p  # noqa: F401

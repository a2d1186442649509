from genomic_pca_tpu.models.exact import ExactPcaResult, exact_pca_from_strips  # noqa: F401
from genomic_pca_tpu.models.pca import PcaResult, streamed_pca, transform  # noqa: F401
from genomic_pca_tpu.models.eigensnp import EigenSnpResult, compute_eigensnp_pca  # noqa: F401
from genomic_pca_tpu.models.prepare import PreparedData, prepare_data  # noqa: F401

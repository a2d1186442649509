from genomic_pca_tpu.utils.timing import StageTimer  # noqa: F401
from genomic_pca_tpu.utils.logsetup import setup_logging  # noqa: F401
from genomic_pca_tpu.utils.rng import key_for_stage  # noqa: F401

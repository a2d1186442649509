from genomic_pca_tpu.parallel.mesh import make_mesh  # noqa: F401
from genomic_pca_tpu.parallel.sharded import ShardedMatrix  # noqa: F401

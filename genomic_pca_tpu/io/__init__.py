from genomic_pca_tpu.io.bed import BedReader, read_bim, read_fam, write_plink  # noqa: F401
from genomic_pca_tpu.io.writers import (  # noqa: F401
    write_eigenvalues,
    write_loadings,
    write_principal_components,
)

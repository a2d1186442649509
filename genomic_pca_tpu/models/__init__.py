from genomic_pca_tpu.models.exact import exact_pca_from_strips, ExactPcaResult  # noqa: F401

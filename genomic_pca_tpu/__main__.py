import sys

from genomic_pca_tpu.cli import main

sys.exit(main())

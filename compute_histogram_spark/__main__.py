import sys

from compute_histogram_spark.cli import main

sys.exit(main())

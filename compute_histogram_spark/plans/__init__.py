from compute_histogram_spark.plans.bin_scheme import BinScheme

__all__ = ["BinScheme"]

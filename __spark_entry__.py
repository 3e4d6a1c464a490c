"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in ``compute_histogram_spark`` (see SURVEY.md §2 for
the operator inventory this registry covers); this module is a thin facade.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from compute_histogram_spark import registry
from compute_histogram_spark.operators.histogram import histogram
from compute_histogram_spark.sources.tables import load


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's full pipeline (SURVEY §3 EP1) — global
    min/max pass, driver bin planning, dense zero-filled linear histogram —
    over events.value at sf0.001."""
    events = load(spark, "/root/testdata/sf0.001", "events")
    return histogram(events, "value", "linear")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLES)

"""Tile-catalog source: a GeoJSON FeatureCollection as a table of URIs.

The reference fetches the catalog with boto3 and loops over features
(``get_tiles`` — main.py:60-74); ``split_s3_path`` (main.py:77-79) splits
bucket/key by hand. Spark-first: the catalog is itself a (tiny) DataFrame —
``spark.read.json`` + ``explode(features)`` + a nested-field projection —
so it composes with joins/filters like any other table, and S3A consumes
full URIs directly (no bucket/key splitting needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_tile_catalog(spark: SparkSession, path: str) -> DataFrame:
    """GeoJSON FeatureCollection -> ``tiles(tile_id INT, uri STRING)``.

    ``features[*].properties.name`` holds the tile URI (main.py:71-72,
    fixture F6). ``multiLine=True`` because a FeatureCollection is one JSON
    document, not JSON-lines.
    """
    raw = spark.read.option("multiLine", "true").json(path)
    return (
        raw.select(F.posexplode("features").alias("tile_id", "feature"))
        .select("tile_id", F.col("feature.properties.name").alias("uri"))
    )


def parse_s3_uri(df: DataFrame, uri_col: str = "uri") -> DataFrame:
    """Column-level twin of ``split_s3_path`` (main.py:77-79) for engines
    that do need bucket/key (e.g. a manifest diff against an inventory)."""
    return df.withColumns(
        {
            "bucket": F.regexp_extract(uri_col, r"^s3://([^/]+)/", 1),
            "key": F.regexp_extract(uri_col, r"^s3://[^/]+/(.*)$", 1),
        }
    )

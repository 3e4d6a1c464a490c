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


# ---------------------------------------------------------------------------
# The same catalog as a REGISTERED SOURCE: PySpark 4's Python Data Source
# API. `spark.read.json` (above) is the quick path; this is the extension
# point a real raster catalog would grow into (predicate pushdown into the
# index, partition planning over tile groups) — and it demonstrates that the
# engine's source surface is pluggable without JVM code.
# ---------------------------------------------------------------------------

from pyspark.sql.datasource import (  # noqa: E402
    DataSource,
    DataSourceReader,
    InputPartition,
)


class TileCatalogDataSource(DataSource):
    """``spark.read.format("tilecatalog").option("path", ...)``:
    a GeoJSON FeatureCollection exposed as ``tiles(tile_id INT, uri
    STRING)`` with explicit partition planning.

    Registration: ``spark.dataSource.register(TileCatalogDataSource)``.
    """

    @classmethod
    def name(cls) -> str:
        return "tilecatalog"

    def schema(self) -> str:
        return "tile_id INT, uri STRING"

    def reader(self, schema):  # noqa: ANN001 — framework signature
        return _TileCatalogReader(self.options)


class _TileCatalogReader(DataSourceReader):
    def __init__(self, options):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("tilecatalog source requires .option('path', ...)")
        self._n_parts = int(options.get("numpartitions", "4"))

    def partitions(self):
        # planning-time split: each InputPartition carries (index, stride);
        # executors read only their residue class — the catalog file itself
        # is small (it is an INDEX of tiles, not tiles), so re-opening it
        # per partition is cheap and keeps partitions independent.
        return [InputPartition(i) for i in range(self._n_parts)]

    def read(self, partition):
        import json

        with open(self._path) as f:
            features = json.load(f).get("features", [])
        for i in range(partition.value, len(features), self._n_parts):
            # missing properties.name -> NULL uri, matching the
            # read_tile_catalog (spark.read.json) path on imperfect input
            yield (i, (features[i].get("properties") or {}).get("name"))

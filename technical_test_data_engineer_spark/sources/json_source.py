"""Nested JSON source — GeoJSON-shaped (SURVEY.md S4).

The reference parses a départements GeoJSON with geopandas
(/root/reference/tasks/visualization/src/visualization.py:23-26),
flattening ``features[].properties`` and keeping ``geometry``. The
geometry is only ever drawn, never computed on (SURVEY.md §1), so the
engine keeps it as a JSON string column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_geojson_features(spark: SparkSession, path: str) -> DataFrame:
    """Read a GeoJSON FeatureCollection into one row per feature:
    flattened ``properties.*`` columns + ``geometry`` as a JSON string.

    ``multiLine=true`` because a FeatureCollection is one JSON document;
    at scale you would pre-split into JSONL (one feature per line) so the
    scan parallelizes — ``explode`` after a multiLine read happens on a
    single task.
    """
    raw = spark.read.option("multiLine", "true").json(path)
    feature = F.explode("features").alias("feature")
    exploded = raw.select(feature)
    return exploded.select(
        F.col("feature.properties.*"),
        F.to_json(F.col("feature.geometry")).alias("geometry"),
    )

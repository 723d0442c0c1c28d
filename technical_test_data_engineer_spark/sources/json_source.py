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


def split_geojson_to_jsonl(
    spark: SparkSession, src_path: str, dst_path: str, num_files: int = 8
) -> None:
    """Pre-split a FeatureCollection into JSONL (one feature object per
    line, ``num_files`` files). The multiLine parse of the single JSON
    document is inherently one task — pay it ONCE at ingest, and every
    downstream read parallelizes like any line-delimited source. This is
    the scale path the ``read_geojson_features`` docstring promises."""
    raw = spark.read.option("multiLine", "true").json(src_path)
    (
        raw.select(F.explode("features").alias("feature"))
        .select(F.to_json(F.col("feature")).alias("value"))
        .repartition(num_files)
        .write.mode("overwrite")
        .text(dst_path)
    )


def read_geojson_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Read pre-split JSONL features (see :func:`split_geojson_to_jsonl`)
    with a fully parallel scan: line-delimited JSON splits at newline
    boundaries, so the scan fans out across executors instead of the
    single task a multiLine FeatureCollection forces. Output schema
    matches :func:`read_geojson_features` (properties.* + geometry
    JSON-string)."""
    raw = spark.read.json(path)
    return raw.select(
        F.col("properties.*"),
        F.to_json(F.col("geometry")).alias("geometry"),
    )

"""Parquet source — the engine-native storage format.

Replaces the reference's JDBC full-table scan
(``pd.read_sql_table``, /root/reference/tasks/visualization/src/visualization.py:19;
SURVEY.md S3) with columnar parquet scans that Catalyst can push filters
and column pruning into. At 100 TB this is the difference between
reading 100 TB and reading the 2 columns × matching row-groups a query
actually needs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one star-schema table from ``{sf_dir}/{name}.parquet``.

    We deliberately do NOT apply the declared schema on read: parquet is
    self-describing, so the footer schema is authoritative and free, and
    forcing a differently-typed StructType onto a parquet scan disables
    vectorized reading. Declared schemas (schemas.py) are used to
    *validate* and to read schema-less formats (CSV/JSON).

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark's
    reader rejects outright; we read it as raw nanos (legacy conf, set
    here so it works under any caller's session) and convert to a
    microsecond TimestampType — the same ns→µs truncation DuckDB's
    ``CAST(ts AS TIMESTAMP)`` performs, keeping the oracle comparable.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    from technical_test_data_engineer_spark.schemas import STAR_SCHEMA

    names = names or list(STAR_SCHEMA)
    return {n: load_table(spark, sf_dir, n) for n in names}


def write_table(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Engine-native sink: overwrite-by-default parquet, mirroring the
    reference's full-replace semantics (``to_sql(if_exists='replace')``,
    /root/reference/tasks/scraper/src/scraper.py:23-24; SURVEY.md S2).

    ``partition_by`` enables partition pruning for fact tables at scale
    (e.g. a date column) — the reference has no notion of this.
    """
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: rows hash-distributed into ``n_buckets``
    files by ``bucket_cols`` at WRITE time. Two tables bucketed the same
    way join WITHOUT a shuffle (co-located sort-merge) — the standard
    way to pre-pay the shuffle for a fact table that joins on the same
    key every day. At 100 TB this converts the nightly join's dominant
    exchange into a free scan-side zip.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(name)

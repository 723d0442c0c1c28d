"""JDBC source/sink (SURVEY.md S2/S3) — parity with the reference's
Postgres layer.

Reference: ``df.to_sql(name, engine, if_exists='replace')`` row-wise
inserts (/root/reference/tasks/scraper/src/scraper.py:23-24) and
``pd.read_sql_table`` full scans (visualization.py:19). The Spark
equivalents below add what matters at scale: partitioned parallel reads
(``partitionColumn``/``numPartitions``) and batched writes.

Exercised END-TO-END against embedded Apache Derby (whose jars ship
inside Spark itself — no external database or network needed):
``tests/test_jdbc_live.py`` does real DDL + batched-insert writes,
range-predicated parallel reads, and full-replace semantics. The
plan-level option-wiring tests in ``tests/test_sources.py`` remain for
the driver-agnostic surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameReader, SparkSession


def jdbc_reader(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    **options: str,
) -> DataFrameReader:
    """Configured JDBC reader. Without ``partition_column`` a JDBC read
    is a single task — unusable at scale; with it, Spark issues
    ``num_partitions`` range-predicated queries in parallel."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader


def read_jdbc_table(spark: SparkSession, url: str, table: str, **kw) -> DataFrame:
    return jdbc_reader(spark, url, table, **kw).load()


def write_jdbc_table(
    df: DataFrame, url: str, table: str, mode: str = "overwrite", **options: str
) -> None:
    """Full-replace JDBC write matching ``if_exists='replace'``
    (scraper.py:23-24). ``batchsize`` batches inserts instead of the
    reference's row-at-a-time ``to_sql``."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", options.pop("batchsize", "10000"))
        .mode(mode)
    )
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()

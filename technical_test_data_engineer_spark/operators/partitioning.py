"""Partition-management helpers.

At cluster scale the parquet scan yields one task per ~128 MB split and
parallelism is free. On small/local inputs (one row-group file) every
downstream per-row computation inherits a SINGLE scan partition — a
3000× slowdown for expression-heavy operators (shingling, LSH
signatures) on a 32-core host. ``fan_out`` repartitions ONLY when the
input has fewer partitions than the session's default parallelism, so
it is a no-op on real cluster scans and a round-robin spread locally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` up to ``min_partitions`` (default: the
    session's ``defaultParallelism``) iff it currently has fewer.

    Checking ``df.rdd.getNumPartitions()`` only compiles the physical
    plan — no job runs. The repartition is round-robin: correct for any
    downstream keyed shuffle (they re-shuffle anyway) and balanced for
    per-row compute.
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df

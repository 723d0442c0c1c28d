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
from pyspark.sql import functions as F


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


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: spread each hot key of ``big`` across
    ``n_salts`` shuffle partitions by salting the key; replicate every
    ``small`` row to all salts so each salted partition still sees its
    full match set.

    Use when one side has heavy key skew AND the small side is too big
    to broadcast (otherwise prefer broadcast, and let AQE's skew-join
    splitting handle moderate skew first). The salt on the big side is
    derived from the row content hash — deterministic, no RNG.

    Cost model: small side shuffles n_salts× its size; the big side's
    hottest key now bounds a task at |key| / n_salts rows.
    """
    salt_b = (F.abs(F.xxhash64(*[F.col(c) for c in big.columns])) % n_salts).alias(
        "_salt"
    )
    big_s = big.withColumn("_salt", salt_b)
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return big_s.join(small_s, [on, "_salt"], how).drop("_salt")

"""Table-maintenance operators: keyed upsert, snapshot diff, small-file
compaction. The ops layer a parquet-based deployment needs once data
stops being write-once — all built on the atomic versioned publisher
(sources/atomic.py) so every rewrite is crash-safe: readers see the old
snapshot until the new one is complete, never a half-rewrite.

These are the plain-parquet equivalents of what table formats
(Delta/Iceberg/Hudi) provide natively; the point here is the Spark
plan shapes — a MERGE is an outer join + coalesce, a diff is a full
outer join with change classification, compaction is a repartition —
expressed so each is one shuffle on the key (or none for compaction).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from technical_test_data_engineer_spark.sources.atomic import (
    current_version,
    publish_tables,
    read_published,
)


def merge_upsert(base: DataFrame, updates: DataFrame, key_cols: list[str]) -> DataFrame:
    """MERGE semantics as one plan: rows in ``updates`` replace same-key
    rows in ``base``; new keys insert; unmatched base rows persist.
    One full-outer-shaped shuffle on the key (here: left_anti + union —
    cheaper than a true full outer because no column coalescing is
    needed when updates carry complete rows).

    ``updates`` must have the same schema as ``base`` and at most one
    row per key (enforce upstream with exact_dedup)."""
    surviving = base.join(updates.select(*key_cols), key_cols, "left_anti")
    return surviving.unionByName(updates)


def snapshot_diff(
    old: DataFrame, new: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Row-level changes between two snapshots: full outer join on the
    key, rows classified ``added`` / ``removed`` / ``changed``
    (unchanged rows are dropped). Non-key columns are compared as a
    single struct hash — one pass, no per-column plan blowup.

    Output: key columns + ``change`` string column."""
    non_key = [c for c in old.columns if c not in key_cols]
    if [c for c in new.columns if c not in key_cols] != non_key:
        raise ValueError("snapshot schemas differ")
    o = old.select(
        *key_cols,
        F.xxhash64(*[F.col(c) for c in non_key]).alias("_oh"),
    )
    n = new.select(
        *key_cols,
        F.xxhash64(*[F.col(c) for c in non_key]).alias("_nh"),
    )
    joined = o.join(n, key_cols, "full_outer")
    change = (
        F.when(F.col("_oh").isNull(), F.lit("added"))
        .when(F.col("_nh").isNull(), F.lit("removed"))
        .when(F.col("_oh") != F.col("_nh"), F.lit("changed"))
    )
    return (
        joined.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(*key_cols, "change")
    )


def publish_upsert(
    spark: SparkSession,
    root: str,
    name: str,
    updates: DataFrame,
    key_cols: list[str],
) -> int:
    """Crash-safe keyed upsert into a published table: read the current
    snapshot, merge, publish a new version atomically. Other tables in
    the snapshot are carried forward by copy (re-read + re-write) —
    correct but write-amplified; avoiding the copy needs per-table
    manifests instead of one version dir, which is precisely the step
    from this pattern to a real table format (Delta/Iceberg)."""
    version = current_version(root)
    if version is None:
        return publish_tables(root, {name: updates})
    base = read_published(spark, root, name)
    merged = merge_upsert(base, updates, key_cols)
    tables: dict[str, DataFrame] = {name: merged}
    vdir = os.path.join(root, f"_v{version}")
    for other in os.listdir(vdir):
        if other != name and not other.startswith("."):
            tables[other] = spark.read.parquet(os.path.join(vdir, other))
    return publish_tables(root, tables)


def compact_table(
    spark: SparkSession,
    root: str,
    name: str,
    target_files: int,
) -> int:
    """Small-file compaction: rewrite a published table into
    ``target_files`` files via coalesce (no shuffle — existing
    partitions are merged map-side) and publish atomically. The
    maintenance pass that keeps scan task counts sane after many
    incremental upserts."""
    df = read_published(spark, root, name).coalesce(target_files)
    version = current_version(root)
    tables: dict[str, DataFrame] = {name: df}
    vdir = os.path.join(root, f"_v{version}")
    for other in os.listdir(vdir):
        if other != name and not other.startswith("."):
            tables[other] = spark.read.parquet(os.path.join(vdir, other))
    return publish_tables(root, tables)

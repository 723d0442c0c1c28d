"""Aggregation operators (SURVEY.md §2.4, A1-A5) + the free Spark
extensions (count-distinct, approx, rollup/cube).

All hash aggregations: Spark plans partial (map-side) + final
aggregation automatically, so a groupBy over 100 TB shuffles only the
pre-combined per-partition groups, not raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from technical_test_data_engineer_spark.functions.scalars import exact_sum


def group_count(
    df: DataFrame, keys: list[str], count_col: str, alias: str
) -> DataFrame:
    """A1 — group-by COUNT (``agg({'code_departement':'count'})``,
    visualization.py:104). Counts non-null values of ``count_col``,
    matching pandas 'count' semantics."""
    return df.groupBy(*keys).agg(F.count(count_col).alias(alias))


def group_sum(df: DataFrame, keys: list[str], sum_col: str, alias: str) -> DataFrame:
    """A2 — group-by SUM (``agg({'surface_zone':'sum'})``,
    visualization.py:193); exact decimal-path sum for doubles."""
    return df.groupBy(*keys).agg(exact_sum(sum_col, alias))


def global_min_max(df: DataFrame, col: str) -> tuple:
    """A3 — global MIN/MAX to the driver (slider bounds,
    visualization.py:237-238)."""
    row = df.agg(F.min(col).alias("mn"), F.max(col).alias("mx")).collect()[0]
    return row["mn"], row["mx"]


def distinct_pairs_by_freq(df: DataFrame, cols: list[str]) -> DataFrame:
    """A4 — ``value_counts`` then drop the count: distinct combos ordered
    most-frequent-first (legend pairs, visualization.py:50). Tie-break on
    the key columns so ordering is deterministic (pandas value_counts is
    stable; Spark needs the explicit tiebreak)."""
    return (
        df.groupBy(*cols)
        .count()
        .orderBy(F.desc("count"), *[F.asc(c) for c in cols])
        .drop("count")
    )


def distinct_values(df: DataFrame, col: str) -> DataFrame:
    """A5 — DISTINCT on one column (visualization.py:136, :255)."""
    return df.select(col).distinct()


def count_distinct(df: DataFrame, keys: list[str], col: str, alias: str) -> DataFrame:
    """Exact distinct-count per group (expand+dedup+count under the hood
    — two shuffles; prefer approx at extreme scale)."""
    return df.groupBy(*keys).agg(F.countDistinct(col).alias(alias))


def approx_count_distinct(
    df: DataFrame, keys: list[str], col: str, alias: str, rsd: float = 0.01
) -> DataFrame:
    """HyperLogLog++ distinct count — one shuffle, fixed memory; the
    100 TB-scale answer to COUNT(DISTINCT)."""
    return df.groupBy(*keys).agg(F.approx_count_distinct(col, rsd).alias(alias))


def rollup_sum(df: DataFrame, keys: list[str], sum_col: str, alias: str) -> DataFrame:
    """ROLLUP hierarchy totals (engine surface beyond the reference)."""
    return df.rollup(*keys).agg(exact_sum(sum_col, alias))


def cube_sum(df: DataFrame, keys: list[str], sum_col: str, alias: str) -> DataFrame:
    """CUBE over all key subsets."""
    return df.cube(*keys).agg(exact_sum(sum_col, alias))

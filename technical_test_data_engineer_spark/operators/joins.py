"""Join operators (SURVEY.md §2.3, J1-J2) plus the full Spark join
surface the reference lacked (semi/anti/range/as-of).

Scale notes baked into each helper:
- dimension tables → broadcast hash join (no shuffle of the fact side);
- fact⋈fact → sort-merge on the key, AQE handles skew;
- as-of/range joins have no Spark builtin — implemented as composition
  (union + window) rather than a Python UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def inner_equi_join(
    left: DataFrame, right: DataFrame, on: str | list[str], broadcast_right: bool = True
) -> DataFrame:
    """J1 — inner equi-join on a shared key name
    (``merge(how='inner', on='id_zone')``, visualization.py:59). The
    reference's zone dim is small → broadcast; pass
    ``broadcast_right=False`` for fact⋈fact."""
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on=on, how="inner")


def left_join_differing_keys(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    broadcast_right: bool = True,
) -> DataFrame:
    """J2 — left outer join with differing key names
    (``merge(how='left', left_on='code', right_on='code_departement')``,
    visualization.py:153). Keeps the duplicate key column dropped, like
    pandas suffixing never fires in the reference."""
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, left[left_key] == r[right_key], "left").drop(right_key)


def semi_join(left: DataFrame, right: DataFrame, on: str | list[str]) -> DataFrame:
    """EXISTS-shaped join; emits only left columns, never duplicates."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | list[str]) -> DataFrame:
    """NOT EXISTS-shaped join — e.g. orphan facts whose dim key is
    missing (the rows the reference's inner join silently drops)."""
    return left.join(right, on=on, how="left_anti")


def range_join(
    left: DataFrame,
    right: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    equi_keys: list[str] | None = None,
    broadcast_right: bool = True,
) -> DataFrame:
    """Point-in-interval join: left rows matched to right intervals
    containing ``left[point_col]``.

    With ``equi_keys`` the range predicate rides on a hash join (cheap).
    Without, it is a broadcast-nested-loop join — fine when one side is
    a dimension; at fact×fact scale, bucketize the point/interval into a
    coarse grid key first (not needed by any reference query).
    """
    cond: Column = (left[point_col] >= right[start_col]) & (
        left[point_col] <= right[end_col]
    )
    if equi_keys:
        for k in equi_keys:
            cond = cond & (left[k] == right[k])
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, cond, "inner")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the single latest right row with
    ``right_ts <= left_ts`` (direction='backward') within the same ``on``
    key — the time-series join Spark lacks natively.

    Implemented as union + window (one shuffle on ``on``), not a UDF:
    tag both sides, sort by time within key, and carry the most recent
    right payload forward onto left rows with ``last(ignorenulls)``.
    Scales as a single partitioned sort — no per-key collect.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")

    payload = [c for c in right.columns if c not in (on, right_ts)]
    l_tag = left.withColumn("_ts", F.col(left_ts)).withColumn("_side", F.lit(1))
    for c in payload:
        l_tag = l_tag.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    r_tag = right.withColumn("_ts", F.col(right_ts)).withColumn("_side", F.lit(0))
    for c in left.columns:
        if c not in (on,) and c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    cols = [on, "_ts", "_side", *[c for c in left.columns if c != on], *payload]
    unioned = l_tag.select(*cols).unionByName(r_tag.select(*cols))

    if direction == "backward":
        # right rows (_side=0) sort before left rows at equal ts → "<="
        w = (
            Window.partitionBy(on)
            .orderBy("_ts", "_side")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    else:
        w = (
            Window.partitionBy(on)
            .orderBy(F.desc("_ts"), "_side")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    out = unioned
    for c in payload:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out.filter(F.col("_side") == 1).drop("_side", "_ts")

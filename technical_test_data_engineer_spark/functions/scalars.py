"""Scalar function surface (SURVEY.md §2.8, F1-F6) + exact-aggregate
helpers.

Everything here is a thin composition of built-in ``pyspark.sql.functions``
— JVM-side, whole-stage-codegen'd. No Python UDFs: the reference's two
Python lambdas (colormap, date-range apply) are both replaced by native
expressions (SURVEY.md §2.9).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def repair_year_typo(col: Column | str, bad: str = "0023", good: str = "2023") -> Column:
    """F1 — literal substring replace repairing typo'd years, matching the
    reference's literal (non-regex) ``str.replace('0023','2023')``
    (/root/reference/tasks/visualization/src/visualization.py:44)."""
    return F.replace(F.col(col) if isinstance(col, str) else col, F.lit(bad), F.lit(good))


def parse_iso_date(col: Column | str) -> Column:
    """F2 — ISO ``YYYY-MM-DD`` string → DateType
    (``pd.to_datetime(col).dt.date``, visualization.py:46-47)."""
    return F.to_date(col)


def inclusive_duration_days(debut: Column | str, fin: Column | str) -> Column:
    """F3 — inclusive interval length in days: ``fin − debut + 1 day``
    (visualization.py:60). Both endpoints count."""
    return (F.datediff(fin, debut) + F.lit(1)).alias("duration_days")


def display_date(col: Column | str, fmt: str = "dd/MM/yyyy") -> Column:
    """F4 — presentation date format (``strftime('%d/%m/%Y')``,
    visualization.py:107/:133), column-capable in the engine."""
    return F.date_format(col, fmt)


# ---------------------------------------------------------------------------
# Exact aggregates over double columns.
#
# Binary-double summation is order-dependent, and a distributed engine
# does not control reduction order — so a double SUM is not reproducible
# run-to-run, let alone engine-to-engine. The engine's convention:
# money/measure doubles are summed as DECIMAL (exact, associative,
# order-independent), then surfaced as double. This makes every
# aggregate bit-reproducible across partitionings AND comparable
# against the DuckDB oracle.
# ---------------------------------------------------------------------------

_DEC = "decimal(30,10)"


def exact_sum(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent SUM for double measures: cast→decimal, sum
    exactly, surface as double."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(_DEC)).cast("double")
    return out.alias(alias) if alias else out


def exact_avg(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent AVG: exact decimal sum ÷ count, divided in
    double so both engines perform the identical final operation."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(_DEC)).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def exact_sum_expr(sql_expr: str, alias: str) -> Column:
    """``exact_sum`` over an arbitrary SQL expression (e.g. extended
    price × (1 − discount))."""
    return F.sum(F.expr(sql_expr).cast(_DEC)).cast("double").alias(alias)

"""F5/F6 — colormap + normalization as ENGINE columns (SURVEY §2.8).

The reference colors its legend and bar plots with matplotlib:
``cmap(norm(x))`` per row, driver-side
(/root/reference/tasks/visualization/src/visualization.py:51,110,147).
Re-expressed Spark-first: min-max normalization and a piecewise-linear
viridis colormap as plain Catalyst expressions — whole-stage-codegen
JVM math emitting ``#RRGGBBAA`` strings, zero Python per row, and
reproducible in DuckDB SQL (printf + the same CASE-WHEN lerp), so the
color column itself is oracle-checkable.

The 5-anchor viridis approximation is deliberate: a 256-entry LUT adds
nothing at legend granularity, and anchors keep the oracle SQL
generable from the same table of constants (single source of truth).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from technical_test_data_engineer_spark.functions.hof import bind

# (t, r, g, b) — viridis at t = 0, ¼, ½, ¾, 1
VIRIDIS_ANCHORS: list[tuple[float, int, int, int]] = [
    (0.00, 68, 1, 84),
    (0.25, 59, 82, 139),
    (0.50, 33, 145, 140),
    (0.75, 94, 201, 98),
    (1.00, 253, 231, 37),
]


def minmax_normalize(c: Column, lo: Column, hi: Column) -> Column:
    """``(c - lo) / (hi - lo)`` clamped to [0, 1]; 0 when hi == lo
    (single-level legend). ``lo``/``hi`` are columns — pass literals,
    global-agg scalars, or per-group window mins/maxes."""
    t = (c.cast("double") - lo.cast("double")) / (
        hi.cast("double") - lo.cast("double")
    )
    return (
        F.when(hi.cast("double") == lo.cast("double"), F.lit(0.0))
        .otherwise(F.least(F.greatest(t, F.lit(0.0)), F.lit(1.0)))
    )


def _channel(t: Column, idx: int) -> Column:
    """Piecewise-linear interpolation of one RGB channel over the
    anchors, rounded half-up via floor(x + 0.5) — the one rounding rule
    both Spark and DuckDB state identically."""
    expr = F.lit(float(VIRIDIS_ANCHORS[-1][idx]))
    # build the CASE chain from the last segment backwards
    for (t0, *c0), (t1, *c1) in reversed(
        list(zip(VIRIDIS_ANCHORS, VIRIDIS_ANCHORS[1:]))
    ):
        lerp = F.lit(float(c0[idx - 1])) + (t - F.lit(t0)) / F.lit(t1 - t0) * F.lit(
            float(c1[idx - 1] - c0[idx - 1])
        )
        expr = F.when(t <= F.lit(t1), lerp).otherwise(expr)
    return F.floor(expr + F.lit(0.5)).cast("int")


def viridis_hex(t: Column) -> Column:
    """``#RRGGBBAA`` viridis color for a normalized [0, 1] column —
    the engine-side equivalent of the reference's ``cmap(norm(x))``.
    Fully JVM expressions; alpha fixed at FF like matplotlib's
    default."""
    def _with_t(tt: Column) -> Column:
        return F.format_string(
            "#%02X%02X%02XFF",
            _channel(tt, 1),
            _channel(tt, 2),
            _channel(tt, 3),
        )

    # bind: t is referenced by all three channel chains — without the
    # let-binding the normalization arithmetic would inline 12×
    return bind(t, _with_t)


def viridis_hex_sql(t_expr: str) -> str:
    """The DuckDB twin of :func:`viridis_hex`, generated from the SAME
    anchor table — one constant source for both engines. ``t_expr`` is
    a SQL expression yielding the normalized value."""

    def channel(idx: int) -> str:
        cases = []
        for (t0, *c0), (t1, *c1) in zip(VIRIDIS_ANCHORS, VIRIDIS_ANCHORS[1:]):
            lerp = (
                f"{float(c0[idx - 1])} + ({t_expr} - {t0}) / {t1 - t0} "
                f"* {float(c1[idx - 1] - c0[idx - 1])}"
            )
            cases.append(f"WHEN {t_expr} <= {t1} THEN {lerp}")
        chain = " ".join(cases)
        last = float(VIRIDIS_ANCHORS[-1][idx])
        return f"CAST(FLOOR((CASE {chain} ELSE {last} END) + 0.5) AS INTEGER)"

    return (
        f"printf('#%02X%02X%02XFF', {channel(1)}, {channel(2)}, {channel(3)})"
    )

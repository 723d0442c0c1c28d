"""F5/F6 engine colormap: hand-computed anchor/midpoint values and the
norm clamp — the reference's cmap(norm(x)) contract without matplotlib."""

from __future__ import annotations

from pyspark.sql import functions as F

from technical_test_data_engineer_spark.functions.colormap import (
    minmax_normalize,
    viridis_hex,
)


def _hex_for(spark, values, lo=0.0, hi=1.0):
    df = spark.createDataFrame([(float(v),) for v in values], "x double")
    t = minmax_normalize(F.col("x"), F.lit(lo), F.lit(hi))
    return [r.c for r in df.select(viridis_hex(t).alias("c")).collect()]

def test_viridis_anchor_values(spark):
    got = _hex_for(spark, [0.0, 0.25, 0.5, 0.75, 1.0])
    assert got == [
        "#440154FF", "#3B528BFF", "#21918CFF", "#5EC962FF", "#FDE725FF",
    ]


def test_viridis_midpoint_lerp(spark):
    # t=0.125: r=68-4.5→64, g=1+40.5→42 (41.5 rounds half-up), b=84+27.5→112
    assert _hex_for(spark, [0.125]) == ["#402A70FF"]


def test_normalize_clamps_and_degenerate_domain(spark):
    df = spark.createDataFrame([(-5.0,), (15.0,)], "x double")
    t = minmax_normalize(F.col("x"), F.lit(0.0), F.lit(10.0))
    assert [r.t for r in df.select(t.alias("t")).collect()] == [0.0, 1.0]
    tz = minmax_normalize(F.col("x"), F.lit(3.0), F.lit(3.0))
    assert [r.t for r in df.select(tz.alias("t")).collect()] == [0.0, 0.0]

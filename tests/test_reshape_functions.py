"""R1/R2 date-spine and F1-F4 scalar semantics (inclusive arithmetic,
literal typo repair) — the edge cases SURVEY.md §7 ranks hardest."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from technical_test_data_engineer_spark.functions.scalars import (
    display_date,
    inclusive_duration_days,
    parse_iso_date,
    repair_year_typo,
)
from technical_test_data_engineer_spark.operators.reshape import (
    date_array,
    date_spine,
)


def test_date_array_single_day(spark):
    df = spark.createDataFrame([("2023-08-15", "2023-08-15")], "d string, f string")
    out = date_array(df, "d", "f").collect()[0]
    assert out.days_list == [dt.date(2023, 8, 15)]


def test_date_spine_inclusive(spark):
    df = spark.createDataFrame([(1, "2023-01-01", "2023-01-03")],
                               "id int, d string, f string")
    days = [r.day for r in date_spine(df, "d", "f").orderBy("day").collect()]
    assert days == [dt.date(2023, 1, 1), dt.date(2023, 1, 2), dt.date(2023, 1, 3)]


def test_repair_year_typo_literal_not_regex(spark):
    df = spark.createDataFrame([("0023-08-15",), ("2023-10-02",)], "fin string")
    out = [r[0] for r in df.select(repair_year_typo("fin")).collect()]
    assert out == ["2023-08-15", "2023-10-02"]


def test_inclusive_duration(spark):
    df = spark.createDataFrame([("2023-01-01", "2023-01-01"),
                                ("2023-01-01", "2023-01-31")], "d string, f string")
    df = df.select(parse_iso_date("d").alias("d"), parse_iso_date("f").alias("f"))
    out = [r[0] for r in df.select(inclusive_duration_days("d", "f")).collect()]
    assert out == [1, 31]  # same-day decree lasts 1 day, not 0


def test_display_date(spark):
    df = spark.createDataFrame([("2023-08-15",)], "d string")
    out = df.select(display_date(F.to_date("d")).alias("x")).collect()[0].x
    assert out == "15/08/2023"

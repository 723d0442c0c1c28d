"""Smoke: every registered query runs at sf0.001 and returns rows with
stable schemas; entry() satisfies the driver contract."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from technical_test_data_engineer_spark.plans.star_queries import ORACLE, QUERIES


def test_all_queries_run(spark, sf_dir):
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name
        assert df.columns, name


def test_oracle_keys_subset_of_queries():
    assert set(ORACLE) <= set(QUERIES)


def test_all_query_schemas_are_atomic(spark, sf_dir):
    """No registered query may return a container-typed top-level
    column (r6 verdict item 2): the driver's pandas canonicalizer
    hash-uniques every column and dies on list/dict cells
    (``embedding_pca_project``'s r06 row: ``TypeError: unhashable
    type: 'list'``). Long-form (posexplode) is the house convention
    for vector-valued results; maps round-trip through explode
    (``user_event_type_map``)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    offenders = []
    for name, fn in QUERIES.items():
        for field in fn(spark, sf_dir).schema.fields:
            if isinstance(field.dataType, (ArrayType, MapType, StructType)):
                offenders.append((name, field.name, field.dataType.simpleString()))
    assert not offenders, offenders


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


import pytest


@pytest.mark.parametrize(
    "ansi_sf_dir",
    ["/root/testdata/sf0.001", "/root/testdata/sf0.01"],
    ids=["sf0.001", "sf0.01"],
)
def test_all_queries_run_under_ansi(spark, ansi_sf_dir):
    """The driver calls queries() with ITS session — Spark 4 defaults
    ANSI on. Every query must be ANSI-safe (no silent-overflow / bad
    casts that ANSI turns into runtime errors). Parametrized over BOTH
    test scales because ANSI faults can be data-dependent: the round-4
    hourly_traffic_anomalies DIVIDE_BY_ZERO only manifested at sf0.001
    (a zero-variance baseline cell exists there but not at sf0.01)."""
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        for name, fn in QUERIES.items():
            assert fn(spark, ansi_sf_dir).count() >= 0, name
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)

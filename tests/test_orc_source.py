"""ORC source/sink: roundtrip parity with parquet, pushdown + pruning
visible in the physical plan, partitioned layout prunes directories."""

from __future__ import annotations

from pyspark.sql import functions as F

from technical_test_data_engineer_spark.sources.orc_source import (
    read_orc,
    write_orc,
)
from technical_test_data_engineer_spark.sources.parquet_source import load_table


def test_orc_roundtrip_matches_parquet(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "customer")
    path = str(tmp_path / "customer_orc")
    write_orc(src, path)
    back = read_orc(spark, path)
    assert back.count() == src.count()
    assert back.schema == src.schema
    a = {tuple(r) for r in src.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b


def test_orc_pushdown_and_pruning(spark, sf_dir, tmp_path):
    path = str(tmp_path / "orders_orc")
    write_orc(load_table(spark, sf_dir, "orders"), path)
    q = read_orc(spark, path).filter(F.col("o_orderkey") < 100).select(
        "o_orderkey", "o_totalprice"
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    # filter reaches the ORC scan (stripe-stat pruning)
    assert "PushedFilters" in plan and "o_orderkey" in plan.split(
        "PushedFilters"
    )[1][:120]
    # column pruning: the scan reads 2 of 6 columns
    read_schema = plan.split("ReadSchema")[1][:160]
    assert "o_orderkey" in read_schema and "o_totalprice" in read_schema
    assert "o_orderstatus" not in read_schema


def test_orc_partitioned_write_prunes(spark, sf_dir, tmp_path):
    path = str(tmp_path / "orders_by_status")
    write_orc(
        load_table(spark, sf_dir, "orders"), path,
        partition_by=["o_orderstatus"],
    )
    q = read_orc(spark, path).filter(F.col("o_orderstatus") == "F")
    plan = q._jdf.queryExecution().executedPlan().toString()
    # hive-layout partition pruning: only the o_orderstatus=F directory
    assert "o_orderstatus=F" in plan or "PartitionFilters" in plan
    full = read_orc(spark, path)
    want = full.filter(F.col("o_orderstatus") == "F").count()
    assert q.count() == want > 0

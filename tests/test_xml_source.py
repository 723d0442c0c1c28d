"""XML source/sink (Spark 4 built-in): roundtrip parity with the
source table, declared-schema read, and the malformed-row surface
matching the CSV source contract."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from technical_test_data_engineer_spark.sources.parquet_source import load_table
from technical_test_data_engineer_spark.sources.xml_source import (
    read_xml,
    write_xml,
)


def test_xml_roundtrip_matches_source(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_xml")
    write_xml(src, path, row_tag="nation")
    back = read_xml(spark, path, row_tag="nation").select(*src.columns)
    assert back.count() == src.count()
    a = {tuple(r) for r in src.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b


def test_xml_declared_schema_single_pass(spark, tmp_path):
    path = str(tmp_path / "typed_xml")
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id long, name string, v double"
    )
    write_xml(df, path, row_tag="row")
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("v", T.DoubleType()),
        ]
    )
    back = read_xml(spark, path, row_tag="row", schema=schema)
    assert back.schema == schema
    assert back.count() == 2


def test_xml_malformed_rows_quarantine_and_drop(spark, tmp_path):
    """PERMISSIVE surfaces the broken element in _corrupt_record
    (typed quarantine, the CSV-source convention); DROPMALFORMED
    silently keeps only parseable rows."""
    p = tmp_path / "feed.xml"
    p.write_text(
        "<rows>"
        "<row><id>1</id><name>ok</name></row>"
        "<row><id>not_a_number</id><name>bad</name></row>"
        "<row><id>3</id><name>ok2</name></row>"
        "</rows>"
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    perm = read_xml(spark, str(p), row_tag="row", schema=schema)
    rows = perm.collect()
    assert len(rows) == 3
    bad = [r for r in rows if r._corrupt_record is not None]
    assert len(bad) == 1 and "not_a_number" in bad[0]._corrupt_record

    dropped = read_xml(
        spark,
        str(p),
        row_tag="row",
        schema=T.StructType(schema.fields[:2]),
        mode="DROPMALFORMED",
    )
    assert {r.id for r in dropped.collect()} == {1, 3}

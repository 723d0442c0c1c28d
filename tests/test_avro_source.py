"""Avro source/sink: full contract when the external spark-avro module
is deployed; a clear gated skip (and a clear error from the source)
when it isn't — same discipline as the Pillow-gated multimodal decode."""

from __future__ import annotations

import pytest

from technical_test_data_engineer_spark.sources.avro_source import (
    AvroSupportMissing,
    avro_available,
    read_avro,
    write_avro,
)
from technical_test_data_engineer_spark.sources.parquet_source import load_table


def test_missing_module_raises_actionable_error(spark, sf_dir, tmp_path):
    if avro_available(spark):
        pytest.skip("spark-avro deployed here; the error path is moot")
    with pytest.raises(AvroSupportMissing, match="--packages"):
        write_avro(load_table(spark, sf_dir, "region"), str(tmp_path / "r"))
    with pytest.raises(AvroSupportMissing):
        read_avro(spark, str(tmp_path / "r"))


def test_avro_roundtrip_matches_parquet(spark, sf_dir, tmp_path):
    if not avro_available(spark):
        pytest.skip(
            "external spark-avro module not deployed (offline install)"
        )
    src = load_table(spark, sf_dir, "customer")
    path = str(tmp_path / "customer_avro")
    write_avro(src, path)
    back = read_avro(spark, path)
    assert back.count() == src.count()
    assert {tuple(r) for r in back.collect()} == {
        tuple(r) for r in src.collect()
    }

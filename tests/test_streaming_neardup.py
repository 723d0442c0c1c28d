"""Streaming near-dup candidate generation: stream output == the batch
band pipeline's candidate set on the same corpus (split across several
micro-batches, so cross-batch pairing exercises the state store), and
the per-bucket state cap bounds a degenerate bucket's output."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from technical_test_data_engineer_spark.operators.dedup import (
    minhash_candidates,
)
from technical_test_data_engineer_spark.sources.parquet_source import load_table
from technical_test_data_engineer_spark.streaming.neardup import (
    stream_minhash_candidates,
)
from technical_test_data_engineer_spark.streaming.sinks import memory_sink

DOCS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


@pytest.fixture(scope="module")
def docs_dir(spark, sf_dir, tmp_path_factory):
    """The sf0.001 documents table as 4 parquet files so the stream
    sees several micro-batches (maxFilesPerTrigger=1) — bucket-mates
    arriving in DIFFERENT batches must still pair via state."""
    path = str(tmp_path_factory.mktemp("docs_stream") / "documents")
    load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).repartition(4).write.parquet(path)
    return path


def _stream_pairs(spark, docs_dir, name, **kw):
    stream = (
        spark.readStream.schema(DOCS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
    )
    q = memory_sink(
        stream_minhash_candidates(stream, **kw), name, output_mode="append"
    )
    q.awaitTermination()
    return spark.table(name)


def test_stream_candidates_equal_batch_candidates(spark, sf_dir, docs_dir):
    got = {
        (r.id_a, r.id_b)
        for r in _stream_pairs(spark, docs_dir, "t_neardup_stream").collect()
    }
    # batch twin: threshold 0.0 keeps EVERY band-collision pair (any
    # jaccard passes), i.e. the raw candidate set before verification
    docs = load_table(spark, sf_dir, "documents")
    want = {
        (r.id_a, r.id_b)
        for r in minhash_candidates(
            docs, threshold=0.0, hot_bucket_cap=None
        ).collect()
    }
    assert got == want and want, (len(got), len(want))


def test_stream_state_cap_bounds_degenerate_bucket(spark, tmp_path):
    # 10 identical docs: every band bucket admits only the first
    # state_cap=3 ids → exactly C(3,2)=3 distinct pairs, not C(10,2)=45
    path = str(tmp_path / "hotdocs")
    text = "all these documents share exactly the same boilerplate text"
    spark.createDataFrame(
        [(i, text) for i in range(10)], DOCS_STREAM_SCHEMA
    ).coalesce(1).write.parquet(path)
    got = {
        (r.id_a, r.id_b)
        for r in _stream_pairs(
            spark, path, "t_neardup_capped", state_cap=3
        ).collect()
    }
    assert got == {(0, 1), (0, 2), (1, 2)}, got

"""Text-analysis operator semantics on hand-computed micro-corpora."""

from __future__ import annotations

from pyspark.sql import functions as F

from technical_test_data_engineer_spark.operators import text as TX


def _docs(spark):
    return spark.createDataFrame(
        [(1, "the quick query"), (2, "join join filter"), (3, "solo")],
        "doc_id long, text string",
    )


def test_token_counts(spark):
    df = _docs(spark).select(
        "doc_id",
        TX.token_count("text").alias("n"),
        TX.unique_token_count("text").alias("u"),
    )
    got = {r.doc_id: (r.n, r.u) for r in df.collect()}
    assert got == {1: (3, 3), 2: (3, 2), 3: (1, 1)}


def test_bpe_ish_tokens_strip_punct(spark):
    df = spark.createDataFrame([("hello, world! it's 42",)], "text string")
    toks = df.select(TX.bpe_ish_tokens("text").alias("t")).collect()[0].t
    assert toks == ["hello", "world", "it's", "42"]


def test_predicted_language_argmax_and_tiebreak(spark):
    # doc 1 hits 'query' (en marker); doc 2 hits fr markers twice;
    # doc 3 hits nothing → all-zero tie → alphabetical first = 'de'
    df = _docs(spark).select(
        "doc_id", TX.predicted_language(TX.tokens("text")).alias("p")
    )
    got = {r.doc_id: r.p for r in df.collect()}
    assert got[1] == "en"
    assert got[2] == "fr"
    assert got[3] == "de"


def test_quality_ratios(spark):
    df = spark.createDataFrame([(1, "the the data data")], "doc_id long, text string")
    row = df.select(*TX.quality_columns("text")).collect()[0]
    assert row.n_tokens == 4
    assert row.stopword_ratio == 0.5   # 'the' twice of 4
    assert row.distinct_ratio == 0.5   # {the, data} of 4


def test_fingerprint_is_md5(spark):
    import hashlib

    df = spark.createDataFrame([("abc",)], "text string")
    fp = df.select(TX.fingerprint("text").alias("fp")).collect()[0].fp
    assert fp == hashlib.md5(b"abc").hexdigest()

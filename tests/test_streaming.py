"""Streaming layer tests: stream output == batch output for the shared
transforms, multi-file incremental ingestion, the stateful operator,
and the full-replace snapshot sink.

Strategy: the events parquet is split into several files in a tmp dir;
the stream reads them (availableNow) and must agree with the same
transformation applied to a batch read of the same directory.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from technical_test_data_engineer_spark.sources.parquet_source import load_table
from technical_test_data_engineer_spark.streaming.sinks import (
    memory_sink,
    snapshot_overwrite_sink,
)
from technical_test_data_engineer_spark.streaming.sources import read_events_stream
from technical_test_data_engineer_spark.streaming.stateful import user_running_stats
from technical_test_data_engineer_spark.streaming.transforms import (
    session_rollup,
    sliding_rollup,
    tumbling_rollup,
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """The sf0.001 events table re-written as 4 parquet files (so the
    stream has several input files to discover)."""
    path = str(tmp_path_factory.mktemp("events_stream") / "events")
    load_table(spark, sf_dir, "events").repartition(4).write.parquet(path)
    return path


@pytest.fixture(scope="module")
def events_batch(spark, events_dir):
    return spark.read.parquet(events_dir)


def _rows(df, *order_cols):
    return [tuple(r) for r in df.orderBy(*order_cols).collect()]


def _run_stream(spark, sdf, name, output_mode="complete"):
    q = memory_sink(sdf, name, output_mode=output_mode)
    q.awaitTermination()
    return spark.table(name)


def test_tumbling_stream_equals_batch(spark, events_dir, events_batch):
    stream = read_events_stream(spark, events_dir)
    got = _run_stream(
        spark,
        tumbling_rollup(stream, window="30 minutes", watermark="1 hour"),
        "t_tumbling",
    )
    want = tumbling_rollup(events_batch, window="30 minutes")
    assert _rows(got, "window_start", "event_type") == _rows(
        want, "window_start", "event_type"
    )


def test_sliding_stream_equals_batch(spark, events_dir, events_batch):
    stream = read_events_stream(spark, events_dir)
    got = _run_stream(
        spark,
        sliding_rollup(stream, window="1 hour", slide="15 minutes", watermark="1 hour"),
        "t_sliding",
    )
    want = sliding_rollup(events_batch, window="1 hour", slide="15 minutes")
    assert _rows(got, "window_start", "event_type") == _rows(
        want, "window_start", "event_type"
    )


def test_session_stream_equals_batch(spark, events_dir, events_batch):
    stream = read_events_stream(spark, events_dir)
    got = _run_stream(
        spark,
        session_rollup(stream, gap="30 minutes", watermark="1 hour"),
        "t_sessions",
    )
    want = session_rollup(events_batch, gap="30 minutes")
    assert _rows(got, "user_id", "session_start") == _rows(
        want, "user_id", "session_start"
    )


def test_incremental_microbatches(spark, events_dir, events_batch):
    """maxFilesPerTrigger=1 → one micro-batch per file; the final
    complete-mode table must still equal the batch answer (incremental
    state accumulation across 4 batches)."""
    stream = read_events_stream(spark, events_dir, max_files_per_trigger=1)
    got = _run_stream(
        spark,
        tumbling_rollup(stream, window="1 hour", watermark="1 hour"),
        "t_incr",
    )
    want = tumbling_rollup(events_batch, window="1 hour")
    assert _rows(got, "window_start", "event_type") == _rows(
        want, "window_start", "event_type"
    )


def test_stateful_user_running_stats(spark, events_dir, events_batch):
    """applyInPandasWithState totals must match a batch groupBy. With
    maxFilesPerTrigger=1 each user's state is updated across several
    micro-batches; the LAST emitted row per user is their lifetime
    total."""
    stream = read_events_stream(spark, events_dir, max_files_per_trigger=1)
    q = memory_sink(user_running_stats(stream), "t_state", output_mode="update")
    q.awaitTermination()
    # update mode appends one row per (user, batch); keep the final row
    got = (
        spark.table("t_state")
        .groupBy("user_id")
        .agg(
            F.max_by("n_events", "n_events").alias("n_events"),
            F.max_by("total_value", "n_events").alias("total_value"),
        )
    )
    want = events_batch.groupBy("user_id").agg(
        F.count("*").alias("n_events"), F.sum("value").alias("total_value")
    )
    g = {r["user_id"]: (r["n_events"], round(r["total_value"], 6)) for r in got.collect()}
    w = {r["user_id"]: (r["n_events"], round(r["total_value"], 6)) for r in want.collect()}
    assert set(g) == set(w)
    for u in w:
        assert g[u][0] == w[u][0], u
        assert abs(g[u][1] - w[u][1]) < 1e-6, u


def test_snapshot_overwrite_sink(spark, events_dir, events_batch, tmp_path):
    """foreachBatch full-replace sink: the final snapshot equals the
    batch rollup (reference refresh semantics, scraper.py:23-24)."""
    out = str(tmp_path / "snapshot")
    ckpt = str(tmp_path / "ckpt")
    stream = read_events_stream(spark, events_dir)
    q = snapshot_overwrite_sink(
        tumbling_rollup(stream, window="1 hour", watermark="1 hour"),
        out,
        ckpt,
        trigger_available_now=True,
    )
    q.awaitTermination()
    got = spark.read.parquet(out)
    want = tumbling_rollup(events_batch, window="1 hour")
    assert _rows(got, "window_start", "event_type") == _rows(
        want, "window_start", "event_type"
    )


def test_stream_dedup_across_microbatches(spark, events_dir, events_batch, tmp_path):
    """Events duplicated across files (micro-batches) must come out
    once; stream result equals batch dropDuplicates on the same data."""
    from technical_test_data_engineer_spark.streaming.transforms import (
        stream_exact_dedup,
    )

    dup_dir = str(tmp_path / "dup_events")
    events_batch.write.parquet(dup_dir)
    events_batch.write.mode("append").parquet(dup_dir)  # every event twice
    stream = read_events_stream(spark, dup_dir, max_files_per_trigger=2)
    deduped = stream_exact_dedup(
        stream, ["event_id"], watermark="10 years"
    ).select("event_id")
    q = memory_sink(deduped, "t_dedup", output_mode="append")
    q.awaitTermination()
    got = spark.table("t_dedup").count()
    want = events_batch.select("event_id").distinct().count()
    assert got == want


def test_stream_static_join_enrichment(spark, events_dir, events_batch, sf_dir):
    """Stream-static join: the event stream enriched with a static
    dimension (no state store needed — the static side is re-read per
    micro-batch); result equals the batch join."""
    static_users = (
        events_batch.select("user_id").distinct()
        .withColumn("user_tag", F.concat(F.lit("u-"), F.col("user_id")))
    )
    static_users.createOrReplaceTempView("static_users_dim")
    stream = read_events_stream(spark, events_dir)
    enriched = stream.join(static_users, "user_id").select(
        "event_id", "user_id", "user_tag"
    )
    q = memory_sink(enriched, "t_enriched", output_mode="append")
    q.awaitTermination()
    got = spark.table("t_enriched")
    assert got.count() == events_batch.count()
    bad = got.filter(F.col("user_tag") != F.concat(F.lit("u-"), F.col("user_id")))
    assert bad.count() == 0


def test_stream_curation_filter_equals_batch(spark, sf_dir, tmp_path):
    """The corpus-curation operators are stateless column expressions,
    so the SAME code curates a stream: documents streamed file-by-file
    through the gopher quality gate + hash-sample must equal the batch
    run over the same directory. (Streaming '100 TB arriving daily' is
    the real deployment shape for corpus filters.)"""
    from technical_test_data_engineer_spark.operators import text as TX

    docs_dir = str(tmp_path / "docs_stream")
    load_table(spark, sf_dir, "documents").repartition(4).write.parquet(docs_dir)
    batch = spark.read.parquet(docs_dir)

    def curate(df):
        toks = TX.tokens("text")
        n_tok = F.size(toks)
        avg_len = F.length("text").cast("double") / n_tok
        dr = F.size(F.array_distinct(toks)).cast("double") / n_tok
        bucket = (
            F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("bigint") % 10
        )
        return (
            df.filter((n_tok >= 20) & (avg_len >= 5.0) & (dr >= 0.35))
            .filter(bucket == 0)
            .select("doc_id")
        )

    stream = spark.readStream.schema(batch.schema).parquet(docs_dir)
    q = memory_sink(curate(stream), "curated_stream", output_mode="append")
    q.awaitTermination()
    got = sorted(r.doc_id for r in spark.table("curated_stream").collect())
    want = sorted(r.doc_id for r in curate(batch).collect())
    assert got == want and len(want) > 0


def test_upsert_sink_applies_cdc_stream(spark, tmp_path):
    """Streamed keyed updates MERGE into the atomic store: later files
    override earlier keys, new keys insert, untouched rows persist —
    and the final table equals a batch merge of the same updates."""
    from technical_test_data_engineer_spark.sources.atomic import (
        publish_tables,
        read_published,
    )
    from technical_test_data_engineer_spark.streaming.sinks import upsert_sink

    root = str(tmp_path / "store")
    publish_tables(
        root,
        {"users": spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")},
    )
    # two update files → (with maxFilesPerTrigger=1) two micro-batches
    upd_dir = tmp_path / "updates"
    upd_dir.mkdir()
    spark.createDataFrame([(2, "B2"), (3, "c")], "k long, v string").coalesce(
        1
    ).write.parquet(str(upd_dir / "f1"))
    spark.createDataFrame([(3, "C3"), (4, "d")], "k long, v string").coalesce(
        1
    ).write.parquet(str(upd_dir / "f2"))

    schema = "k long, v string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(upd_dir / "*"))
    )
    q = upsert_sink(
        stream, root, "users", ["k"], checkpoint=str(tmp_path / "ckpt")
    )
    q.awaitTermination()

    got = {r.k: r.v for r in read_published(spark, root, "users").collect()}
    # f1 and f2 both touch key 3; micro-batch order is not guaranteed
    # across glob'd files, so assert the invariants that ARE defined:
    assert got[1] == "a" and got[2] == "B2" and got[4] == "d"
    assert got[3] in ("c", "C3")
    assert set(got) == {1, 2, 3, 4}


def test_stream_stream_join_equals_batch(spark, events_dir, events_batch):
    """Stream-stream interval join (both sides watermarked, time-bounded
    condition) must produce exactly the batch self-join's pairs. Append
    mode — the only output mode stream-stream inner joins support."""
    from technical_test_data_engineer_spark.streaming.transforms import (
        view_click_attribution_join,
    )

    stream = read_events_stream(spark, events_dir)
    got = _run_stream(
        spark,
        view_click_attribution_join(stream, watermark="1 hour"),
        "t_ss_join",
        output_mode="append",
    )
    want = view_click_attribution_join(events_batch)
    assert _rows(got, "user_id", "view_ts", "click_ts") == _rows(
        want, "user_id", "view_ts", "click_ts"
    )


def test_stream_stream_outer_join_equals_batch(spark, events_dir, events_batch):
    """Stream-stream LEFT OUTER interval join: unmatched (unconverted)
    views flush only as the watermark expires their join state — the
    no-data final micro-batch after availableNow drains must advance
    the watermark past every view, so the streamed abandonment set
    equals the batch NOT-EXISTS twin exactly."""
    from technical_test_data_engineer_spark.streaming.transforms import (
        unconverted_views,
    )

    stream = read_events_stream(spark, events_dir)
    got = _run_stream(
        spark,
        unconverted_views(stream, watermark="1 hour"),
        "t_ss_outer_join",
        output_mode="append",
    )
    want = unconverted_views(events_batch)
    # Finality horizon: a view's "no click" verdict flushes only once
    # the watermark (max event time − 1 h) passes view_ts + 30 min, so
    # the last ~1.5 h of views is legitimately still withheld when the
    # stream drains. Below the horizon (minus a boundary margin) the
    # sets must match EXACTLY; everywhere, every streamed row must be a
    # true batch row (soundness — the stream never invents abandonment).
    max_ts = events_batch.agg(F.max("ts").alias("m")).collect()[0]["m"]
    horizon = F.lit(max_ts) - F.expr("interval 100 minutes")
    assert _rows(
        got.filter(F.col("view_ts") < horizon), "user_id", "view_ts"
    ) == _rows(
        want.filter(F.col("view_ts") < horizon), "user_id", "view_ts"
    )
    got_all = set(_rows(got, "user_id", "view_ts"))
    want_all = set(_rows(want, "user_id", "view_ts"))
    assert got_all <= want_all


def test_rocksdb_state_store_stream_equals_batch(spark, events_dir, events_batch, tmp_path):
    """Same tumbling rollup, but with the RocksDB state store provider —
    the production backend for streaming state that outgrows the JVM
    heap (100 TB streams hold millions of windows; the default
    HDFS-backed in-memory provider OOMs first). Output must be
    identical: the provider changes WHERE state lives, never its
    semantics."""
    stream = read_events_stream(spark, events_dir)
    sdf = tumbling_rollup(stream, window="30 minutes", watermark="1 hour")
    conf_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(conf_key, None)
    # must be a SESSION conf at query start — a writeStream .option()
    # with this key is silently ignored (verified: identical
    # HDFS-provider metrics), the classic way this test goes vacuous
    spark.conf.set(
        conf_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        q = (
            sdf.writeStream.format("memory")
            .queryName("t_rocksdb_roll")
            .outputMode("complete")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.awaitTermination()
    finally:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)
    # prove the provider actually engaged (a typo'd option would fall
    # back to the default provider and silently prove nothing):
    # RocksDB-specific custom metrics appear in the progress events
    import json

    progresses = [json.loads(p.json) for p in q.recentProgress]
    metrics = [
        so.get("customMetrics", {})
        for pr in progresses
        for so in pr.get("stateOperators", [])
    ]
    assert any("rocksdb" in k for m in metrics for k in m), metrics
    got = spark.table("t_rocksdb_roll")
    want = tumbling_rollup(events_batch, window="30 minutes")
    assert _rows(got, "window_start", "event_type") == _rows(
        want, "window_start", "event_type"
    )


def test_stream_restart_from_checkpoint_no_duplicates(spark, events_dir, events_batch, tmp_path):
    """Kill a stream mid-ingest and restart from its checkpoint: the
    final result must equal the batch answer exactly — offsets in the
    checkpoint make re-delivery impossible (exactly-once for this
    source+sink pair), the property a production pipeline restarts
    rely on."""
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run_once():
        stream = read_events_stream(spark, events_dir, max_files_per_trigger=1)
        return (
            stream.select("event_id", "user_id", "value")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    q = run_once()
    # stop after the first micro-batch commits (poll, bounded wait)
    import time

    deadline = time.time() + 60
    while not q.recentProgress and time.time() < deadline:
        time.sleep(0.2)
    q.stop()
    q.awaitTermination()

    q2 = run_once()  # resume from the same checkpoint
    q2.awaitTermination()

    got = spark.read.parquet(out)
    assert got.count() == events_batch.count()  # nothing lost
    assert got.select("event_id").distinct().count() == got.count()  # nothing doubled


def test_transform_with_state_totals_equal_batch(spark, events_dir, events_batch, tmp_path):
    """Spark 4 arbitrary-state API (transformWithStateInPandas, RocksDB
    required): per-user lifetime totals accumulated across micro-batches
    must equal the batch groupBy — and agree with the older
    applyInPandasWithState operator they supersede. The TWS state
    server speaks protobuf; without a working google.protobuf the
    driver worker cannot start, so the test skips (the same
    optional-dependency seam as the Pillow decode test)."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip("google.protobuf unavailable: transformWithState "
                    "state server cannot start in this container")
    from technical_test_data_engineer_spark.streaming.stateful import (
        user_running_stats_tws,
    )

    conf_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(conf_key, None)
    spark.conf.set(
        conf_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = read_events_stream(spark, events_dir, max_files_per_trigger=1)
        q = memory_sink(
            user_running_stats_tws(stream), "t_tws", output_mode="update"
        )
        q.awaitTermination()
    finally:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)

    got = (
        spark.table("t_tws")
        .groupBy("user_id")
        .agg(
            F.max_by("n_events", "n_events").alias("n_events"),
            F.max_by("total_value", "n_events").alias("total_value"),
        )
    )
    want = events_batch.groupBy("user_id").agg(
        F.count("*").alias("n_events"), F.sum("value").alias("total_value")
    )
    g = {r["user_id"]: (r["n_events"], round(r["total_value"], 6)) for r in got.collect()}
    w = {r["user_id"]: (r["n_events"], round(r["total_value"], 6)) for r in want.collect()}
    assert set(g) == set(w)
    for u in w:
        assert g[u][0] == w[u][0], u
        assert abs(g[u][1] - w[u][1]) < 1e-6, u


def test_stream_stream_full_outer_join_equals_batch(
    spark, events_dir, events_batch
):
    """Stream-stream FULL OUTER interval join: both sides' unmatched
    rows flush on watermark expiry. Same finality-horizon discipline as
    the left-outer test, applied symmetrically: below the horizon the
    streamed relation equals the batch full outer exactly; everywhere,
    matched pairs must agree with the inner join (the full outer never
    invents or loses a match)."""
    from technical_test_data_engineer_spark.streaming.transforms import (
        attribution_full_outer,
        view_click_attribution_join,
    )

    stream = read_events_stream(spark, events_dir)
    got = _run_stream(
        spark,
        attribution_full_outer(stream, watermark="1 hour"),
        "t_ss_full_outer_join",
        output_mode="append",
    )
    want = attribution_full_outer(events_batch)
    max_ts = events_batch.agg(F.max("ts").alias("m")).collect()[0]["m"]
    # Finality horizon, wider than the left-outer test's: full-outer
    # null emission happens on STATE EVICTION, and with availableNow's
    # single no-data batch the click side's eviction pass runs one
    # watermark update behind — measured withheld rows sit up to ~3 h
    # behind max event time (a production stream flushes them on the
    # next arriving data). 5 h bounds that with margin; the fixture
    # spans a month, so the horizon still checks >98% of rows exactly.
    horizon = F.lit(max_ts) - F.expr("interval 5 hours")
    below = (
        F.coalesce(F.col("view_ts"), F.col("click_ts")) < horizon
    ) & (
        F.coalesce(F.col("click_ts"), F.col("view_ts")) < horizon
    )
    assert _rows(
        got.filter(below), "user_id", "view_ts", "click_ts"
    ) == _rows(want.filter(below), "user_id", "view_ts", "click_ts")
    # matched pairs are final as soon as both rows exist — they must
    # equal the inner join everywhere, stream and batch alike
    inner = view_click_attribution_join(events_batch)
    got_pairs = _rows(
        got.filter(
            F.col("view_ts").isNotNull() & F.col("click_ts").isNotNull()
        ),
        "user_id", "view_ts", "click_ts",
    )
    assert got_pairs == _rows(inner, "user_id", "view_ts", "click_ts")


def test_source_mixture_rollup_stream_equals_batch(spark, sf_dir, tmp_path):
    """The source-mixture monitor's kernel (source_mixture_rollup) is
    one projection + one grouped agg, so the SAME function maintains
    the mixture incrementally over a document stream: complete-mode
    output after availableNow drains must equal the batch rollup —
    the contract the batch-side oracle pairing of source_mixture_drift
    extends to the unbounded path."""
    from technical_test_data_engineer_spark.streaming.transforms import (
        source_mixture_rollup,
    )

    docs_dir = str(tmp_path / "docs_mix_stream")
    load_table(spark, sf_dir, "documents").repartition(4).write.parquet(docs_dir)
    batch = spark.read.parquet(docs_dir)

    stream = spark.readStream.schema(batch.schema).parquet(docs_dir)
    got = _rows(
        _run_stream(
            spark, source_mixture_rollup(stream, batch_size=200), "mix_stream"
        ),
        "batch_id",
        "source",
    )
    want = _rows(source_mixture_rollup(batch, batch_size=200), "batch_id", "source")
    assert got == want and len(want) > 0


def test_source_mixture_rollup_incremental_microbatches(spark, sf_dir, tmp_path):
    """maxFilesPerTrigger=1 → the mixture accumulates across 4
    micro-batches (each file carries a doc_id slice, so most
    (batch_id, source) groups UPDATE across triggers rather than
    arriving whole); the final complete-mode table must equal the
    batch rollup — the incremental-maintenance contract an ingestion
    monitor actually relies on."""
    from technical_test_data_engineer_spark.streaming.transforms import (
        source_mixture_rollup,
    )

    docs_dir = str(tmp_path / "docs_mix_incr")
    load_table(spark, sf_dir, "documents").repartition(4).write.parquet(docs_dir)
    batch = spark.read.parquet(docs_dir)

    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
    )
    got = _rows(
        _run_stream(
            spark,
            source_mixture_rollup(stream, batch_size=200),
            "mix_incr",
        ),
        "batch_id",
        "source",
    )
    want = _rows(source_mixture_rollup(batch, batch_size=200), "batch_id", "source")
    assert got == want and len(want) > 0

"""Text-analysis operator semantics on hand-computed micro-corpora."""

from __future__ import annotations

from pyspark.sql import functions as F

from technical_test_data_engineer_spark.operators import text as TX
from technical_test_data_engineer_spark.operators.text import winnow_fingerprints


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


def test_winnow_shared_run_guarantee(spark):
    """Any shared token run of >= w+k-1 tokens must share a fingerprint
    (the winnowing theorem, k=5 w=4 -> run of 8)."""
    shared = " ".join(f"s{i}" for i in range(8))
    a = "x1 x2 x3 " + shared + " y1 y2"
    b = "z1 " + shared + " w1 w2 w3"
    df = spark.createDataFrame([(0, a), (1, b)], "doc_id long, text string")
    rows = {r["doc_id"]: set(r["fp"]) for r in df.select(
        "doc_id", winnow_fingerprints("text", k=5, w=4).alias("fp")).collect()}
    assert rows[0] & rows[1], "shared 8-token run produced no common fingerprint"


def test_winnow_density_and_determinism(spark):
    text = " ".join(f"t{i % 7}" for i in range(60))
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    fp = lambda: df.select(winnow_fingerprints("text").alias("f")).collect()[0]["f"]
    f1, f2 = fp(), fp()
    assert f1 == f2
    n_shingles = 60 - 4
    assert len(f1) < n_shingles / 2  # far sparser than full shingling


def test_approx_distinct_tolerance(spark, sf_dir):
    from technical_test_data_engineer_spark.plans.streaming_queries import (
        events_approx_user_counts,
    )
    from technical_test_data_engineer_spark.sources.parquet_source import load_table

    got = {r["event_type"]: r["approx_users"]
           for r in events_approx_user_counts(spark, sf_dir).collect()}
    events = load_table(spark, sf_dir, "events")
    exact = {r["event_type"]: r["n"]
             for r in events.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("n")).collect()}
    for et, n in exact.items():
        assert abs(got[et] - n) <= max(2, 0.05 * n), (et, got[et], n)


def test_quantile_sketch_tolerance(spark, sf_dir):
    from technical_test_data_engineer_spark.plans.streaming_queries import (
        acctbal_quantile_sketch,
    )
    from technical_test_data_engineer_spark.sources.parquet_source import load_table

    got = {r["c_mktsegment"]: (r["median_approx"], r["p95_approx"])
           for r in acctbal_quantile_sketch(spark, sf_dir).collect()}
    cust = load_table(spark, sf_dir, "customer")
    exact = {r["c_mktsegment"]: (r["m"], r["p"])
             for r in cust.groupBy("c_mktsegment").agg(
                 F.median("c_acctbal").alias("m"),
                 F.percentile("c_acctbal", F.lit(0.95)).alias("p")).collect()}
    for seg, (m, p) in exact.items():
        spread = abs(p) + abs(m) + 1
        assert abs(got[seg][0] - m) <= 0.05 * spread, seg
        assert abs(got[seg][1] - p) <= 0.05 * spread, seg


def test_token_ngrams_keeps_repeats(spark):
    df = spark.createDataFrame([("a b a b",)], "text string")
    grams = df.select(TX.token_ngrams("text", 2).alias("g")).collect()[0].g
    # unlike word_shingles (distinct), counting form keeps the repeat
    assert grams == ["a b", "b a", "a b"]
    short = spark.createDataFrame([("solo",)], "text string")
    assert short.select(TX.token_ngrams("text", 2).alias("g")).collect()[0].g == [
        "solo"
    ]


def test_pattern_count_email_url_digits(spark):
    df = spark.createDataFrame(
        [("mail me at a.b@example.com or http://x.io ref 1234567",)],
        "text string",
    )
    got = df.select(
        TX.pattern_count("text", TX.EMAIL_RE).alias("e"),
        TX.pattern_count("text", TX.URL_RE).alias("u"),
        TX.pattern_count("text", TX.DIGIT_RUN_RE).alias("d"),
    ).collect()[0]
    assert (got.e, got.u, got.d) == (1, 1, 1)


def test_charclass_columns(spark):
    df = spark.createDataFrame([("abc 123 a-b xyz",)], "text string")
    got = df.select(*TX.charclass_columns("text")).collect()[0]
    assert got.n_tokens == 4
    assert got.n_digit_tokens == 1
    assert got.n_symbol_tokens == 1  # only 'a-b' has a symbol
    assert got.digit_token_ratio == 0.25
    assert got.symbol_token_ratio == 0.25


def test_dsir_ranks_target_like_docs_higher(spark):
    """Planted two-domain corpus: docs sharing the target domain's
    n-grams must get higher importance weights than off-domain docs."""
    from technical_test_data_engineer_spark.operators.text import (
        dsir_importance_weights,
    )

    wiki = "the encyclopedia article describes the historical treaty"
    spam = "click here buy now cheap deals win money fast"
    rows = [
        (1, wiki), (2, wiki + " in detail"), (3, spam),
        (4, spam + " today"), (5, "the treaty article is historical"),
    ]
    raw = spark.createDataFrame(rows, "doc_id long, text string")
    target = raw.filter("doc_id IN (1, 2)")
    w = {
        r.doc_id: r.weight
        for r in dsir_importance_weights(raw, target).collect()
    }
    assert len(w) == 5
    # on-domain docs (incl. the unseen-but-similar doc 5) beat spam
    assert min(w[1], w[2], w[5]) > max(w[3], w[4])


def test_repeated_kgram_spans_planted(spark):
    """Two docs sharing an 8-token run: each must report exactly that
    run as one merged span (consecutive repeated 5-grams coalesce);
    a doc with no repeats reports nothing; short docs are ignored."""
    from technical_test_data_engineer_spark.operators.text import (
        repeated_kgram_spans,
    )

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    rows = [
        (1, shared + " unique1 tail1 end1 stop1 done1"),
        (2, "lead2 first2 " + shared),
        (3, "totally different words here nothing repeats at all today"),
        (4, "too short"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = {
        r.doc_id: (r.span_start, r.span_end, r.span_tokens)
        for r in repeated_kgram_spans(df, k=5).collect()
    }
    assert spans == {1: (1, 8, 8), 2: (3, 10, 8)}


def test_bpe_merge_pair_counts_hand_checked(spark):
    from technical_test_data_engineer_spark.operators.text import (
        bpe_merge_pair_counts,
    )

    df = spark.createDataFrame(
        [("aa ab x abc",), ("ab",)], "text string"
    )  # vocab: aa:1 ab:2 abc:1; 'x' dropped (len<2)
    got = {
        r["pair"]: r["n_occurrences"]
        for r in bpe_merge_pair_counts(df).collect()
    }
    assert got == {"aa": 1, "ab": 3, "bc": 1}


def test_corpus_mix_rates_budget_binds_on_scarcest(spark):
    from technical_test_data_engineer_spark.operators.text import (
        corpus_mix_rates,
    )

    df = spark.createDataFrame(
        [("en", f"t{i}") for i in range(80)]
        + [("fr", f"u{i}") for i in range(20)],
        "lang string, text string",
    )
    # target 50/50 but only 20 fr docs → budget 40: fr rate 1.0, en 0.25
    rates = {
        r["lang"]: r for r in corpus_mix_rates(df, {"en": 0.5, "fr": 0.5}).collect()
    }
    assert rates["fr"]["rate"] == 1.0
    assert abs(rates["en"]["rate"] - 0.25) < 1e-12
    assert rates["en"]["n_docs"] == 80


def test_corpus_mix_sample_deterministic_and_bounded(spark):
    from technical_test_data_engineer_spark.operators.text import (
        corpus_mix_sample,
    )

    df = spark.createDataFrame(
        [("en", f"text number {i}") for i in range(200)]
        + [("fr", f"texte {i}") for i in range(50)],
        "lang string, text string",
    )
    kept1 = corpus_mix_sample(df, {"en": 0.5, "fr": 0.5}, "lang", "text")
    a = sorted(r["text"] for r in kept1.collect())
    b = sorted(r["text"] for r in kept1.collect())
    assert a == b  # hash-deterministic, no rand()
    by_lang = {
        r["lang"]: r["n"]
        for r in kept1.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert by_lang["fr"] == 50  # binding group keeps everything
    assert by_lang["en"] <= 200  # others downsampled toward 50/50


def test_tfidf_cosine_neighbors_identical_docs_cos1(spark):
    from technical_test_data_engineer_spark.operators.text import (
        tfidf_cosine_neighbors,
    )

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "alpha beta gamma"),
            (3, "delta epsilon zeta"),
            (4, "alpha delta common common"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_cosine_neighbors(df, k=2, max_df_frac=0.9).collect()
    by_a = {}
    for r in out:
        by_a.setdefault(r["doc_a"], []).append(r)
    # identical docs are each other's rank-1 neighbor at cos ~= 1
    top1 = {a: rows[0] for a, rows in ((a, sorted(rs, key=lambda r: r["rank"])) for a, rs in by_a.items())}
    assert top1[1]["doc_b"] == 2 and abs(top1[1]["cos"] - 1.0) < 1e-9
    assert top1[2]["doc_b"] == 1 and abs(top1[2]["cos"] - 1.0) < 1e-9
    # all cosines bounded
    assert all(-1e-9 <= r["cos"] <= 1 + 1e-9 for r in out)


def test_tfidf_cosine_neighbors_df_cap_prunes_hot_terms(spark):
    from technical_test_data_engineer_spark.operators.text import (
        tfidf_cosine_neighbors,
    )

    # 'common' appears in every doc; with a tight df cap the only
    # candidate path left is the rare shared term 'rare'
    df = spark.createDataFrame(
        [
            (1, "common rare a b"),
            (2, "common rare c d"),
            (3, "common x y z"),
            (4, "common p q s"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_cosine_neighbors(df, k=3, max_df_frac=0.5).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in out}
    assert (1, 2) in pairs and (2, 1) in pairs
    assert all(a in (1, 2) and b in (1, 2) for a, b in pairs)


def test_hll_merge_equals_rescan_and_error_floor(spark, sf_dir):
    """The merge path (day sketches unioned to month) must estimate
    within lgK=14 error of exact, AND agree with sketching the month
    directly from raw events — the property that makes materialized
    day-level sketches a safe substitute for re-scanning the stream."""
    from technical_test_data_engineer_spark.plans.streaming_queries import (
        monthly_users_hll_merge,
    )
    from technical_test_data_engineer_spark.sources.parquet_source import load_table

    out = monthly_users_hll_merge(spark, sf_dir).collect()
    assert out
    for r in out:
        assert r.rel_err <= 0.02, (r.month, r.est_users, r.exact_users)

    events = load_table(spark, sf_dir, "events")
    direct = {
        r["month"]: r["est"]
        for r in events.groupBy(
            F.trunc(F.to_date("ts"), "month").alias("month")
        )
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(14))
            ).alias("est")
        )
        .collect()
    }
    for r in out:
        assert direct[r.month] == r.est_users  # merge == one-shot


def test_adaptive_buckets_population_stays_constant():
    # r07 verdict item 4: with a FIXED bucket count, blocked self-join
    # candidates are n²/B — still quadratic. adaptive_buckets must keep
    # the EXPECTED bucket population (n / B) ~constant as n grows, and
    # never drop below the floor.
    assert TX.adaptive_buckets(0) == 16
    assert TX.adaptive_buckets(500) == 16          # floor binds
    # B = max(floor, n // 64) gives pop = n/B < 64 + 64/B <= 68 at
    # B >= 16 (floor division); include non-divisible n so the bound
    # is the real invariant, not a sampling artifact
    for n in (4_096, 65_536, 1_048_576, 16_777_216, 1_151, 1_000_001):
        b = TX.adaptive_buckets(n, target_bucket=64, floor=16)
        pop = n / b
        assert 32 <= pop <= 68, (n, b, pop)       # ~target, never 2x over
    # monotone: more nodes never means fewer buckets
    bs = [TX.adaptive_buckets(n) for n in (10, 1_000, 10_000, 100_000)]
    assert bs == sorted(bs)


def test_head_fingerprint_clusters_shared_heads(spark):
    # re-scrapes share document HEADS while tails drift — the head
    # fingerprint must cluster them while the full fingerprint doesn't
    head = "w " * 60  # 120 chars, > the 100-char prefix
    df = spark.createDataFrame(
        [(1, head + "tail one"), (2, head + "a different tail"),
         (3, "completely other document")],
        "doc_id long, text string",
    )
    out = df.select(
        "doc_id",
        TX.head_fingerprint("text").alias("hf"),
        TX.fingerprint("text").alias("f"),
    ).collect()
    by_id = {r.doc_id: r for r in out}
    assert by_id[1].hf == by_id[2].hf          # shared head clusters
    assert by_id[1].f != by_id[2].f            # full text still distinct
    assert by_id[3].hf != by_id[1].hf


def test_gopher_repetition_flags_planted_boilerplate(spark, tmp_path):
    import pandas as pd

    from technical_test_data_engineer_spark.plans.text_queries import (
        doc_gopher_repetition,
    )

    # doc 0: one bigram repeated 10x -> dup_frac = 1 - 1/10 = 0.9
    # doc 1: all-distinct tokens -> dup_frac 0; doc 2: single token -> 0
    rows = [
        (0, "spam " * 10 + "spam", "en", "srcA", 0),
        (1, "alpha beta gamma delta", "en", "srcB", 0),
        (2, "solo", "en", "srcB", 0),
    ]
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(tmp_path / "documents.parquet", index=False)
    out = {
        r.source: r
        for r in doc_gopher_repetition(spark, str(tmp_path)).collect()
    }
    assert out["srcA"].n_flagged == 1 and out["srcA"].flag_rate == 1.0
    assert abs(out["srcA"].mean_dup_bigram_frac - 0.9) < 1e-9
    assert out["srcB"].n_flagged == 0
    assert out["srcB"].mean_dup_bigram_frac == 0.0

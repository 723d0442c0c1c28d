"""Text-analysis queries over the documents table (north-star §2.11),
each with a DuckDB oracle built from the same integer-exact primitives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from technical_test_data_engineer_spark.operators import text as TX
from technical_test_data_engineer_spark.plans.star_queries import query
from technical_test_data_engineer_spark.sources.parquet_source import load_table


@query(
    "doc_token_stats",
    """
    SELECT doc_id, lang,
           CAST(LEN(STR_SPLIT(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(LEN(LIST_DISTINCT(STR_SPLIT(text, ' '))) AS BIGINT) AS n_unique,
           n_chars
    FROM documents
    ORDER BY doc_id
    """,
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting — whitespace tokenizer, total + distinct."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "lang",
        TX.token_count("text").alias("n_tokens"),
        TX.unique_token_count("text").alias("n_unique"),
        "n_chars",
    ).orderBy("doc_id")


_STOP_SQL = "['the','a','of','and','to','in']"


@query(
    "doc_quality_scores",
    f"""
    SELECT doc_id,
           CAST(LEN(toks) AS BIGINT) AS n_tokens,
           CAST(LENGTH(text) AS DOUBLE) / LEN(toks) AS avg_token_len,
           CAST(LEN(LIST_FILTER(toks, t -> LIST_CONTAINS({_STOP_SQL}, t))) AS DOUBLE)
               / LEN(toks) AS stopword_ratio,
           CAST(LEN(LIST_DISTINCT(toks)) AS DOUBLE) / LEN(toks) AS distinct_ratio
    FROM (SELECT doc_id, text, STR_SPLIT(text, ' ') AS toks FROM documents)
    ORDER BY doc_id
    """,
)
def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length / stopword / distinct ratios. All ratios
    are exact-int ÷ exact-int in double — bit-stable across engines."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", *TX.quality_columns("text")).orderBy("doc_id")


def _lang_case_sql() -> str:
    langs = sorted(TX.LANG_MARKERS)
    score = {
        lang: f"LEN(LIST_FILTER(toks, t -> LIST_CONTAINS("
        f"[{','.join(repr(m) for m in TX.LANG_MARKERS[lang])}], t)))"
        for lang in langs
    }
    whens = []
    for lang in langs:
        conds = " AND ".join(
            f"{score[lang]} >= {score[o]}" for o in langs if o != lang
        )
        whens.append(f"WHEN {conds} THEN '{lang}'")
    return "CASE " + " ".join(whens) + " END"


@query(
    "doc_language_id",
    f"""
    SELECT doc_id, lang AS labeled_lang,
           {_lang_case_sql()} AS predicted_lang
    FROM (SELECT doc_id, lang, STR_SPLIT(text, ' ') AS toks FROM documents)
    ORDER BY doc_id
    """,
)
def doc_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: marker-vocabulary hit scoring with an
    alphabetical argmax tiebreak (operators/text.predicted_language)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = TX.tokens("text")
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        TX.predicted_language(toks).alias("predicted_lang"),
    ).orderBy("doc_id")


@query(
    "doc_fingerprints",
    """
    SELECT doc_id, MD5(text) AS fp
    FROM documents
    ORDER BY doc_id
    """,
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint (md5 hex) — exact-dup key + stable shard id."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", TX.fingerprint("text").alias("fp")).orderBy("doc_id")


@query(
    "tfidf_top_terms",
    """
    WITH tok AS (
        SELECT doc_id, UNNEST(STR_SPLIT(text, ' ')) AS term FROM documents
    ),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
    ),
    df AS (
        SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT doc_id, term,
           ROUND(CAST(tf AS DOUBLE)
                 * LN((CAST(n_docs AS DOUBLE) + 1.0) / (CAST(df AS DOUBLE) + 1.0)),
                 6) AS score
    FROM (
        SELECT tf.doc_id, tf.term, tf.tf, df.df, n.n_docs,
               ROW_NUMBER() OVER (
                   PARTITION BY tf.doc_id
                   ORDER BY CAST(tf AS DOUBLE)
                            * LN((CAST(n_docs AS DOUBLE) + 1.0)
                                 / (CAST(df AS DOUBLE) + 1.0)) DESC,
                            term ASC
               ) AS rn
        FROM tf JOIN df USING (term) CROSS JOIN n
    )
    WHERE rn <= 3
    ORDER BY doc_id, term
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-3 terms per document.

    Plan shape at scale: one explode → two hash aggs (tf, df) → broadcast
    of the (small) df side → window top-k. The doc count is a scalar
    broadcast, not a cross join of data.
    Score rounded to 6dp in both engines: LN is the one non-rational op
    in the battery, and libm vs JVM can differ in the last ulp.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = TX.tokens_long(docs)
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    # document frequency FROM tf: its rows are already distinct
    # (doc, term) pairs, so df is a plain count — no second explode
    # pass over the corpus, no countDistinct expansion; the tf exchange
    # is reused for both consumers
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.count()  # scalar to the driver; literal in the plan
    score = (
        F.col("tf").cast("double")
        * F.log((F.lit(float(n_docs)) + F.lit(1.0)) / (F.col("df").cast("double") + F.lit(1.0)))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc(score), F.asc("term"))
    return (
        tf.join(F.broadcast(df), "term")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", F.round(score, 6).alias("score"))
        .orderBy("doc_id", "term")
    )


# rows-only: xxhash64 has no DuckDB equivalent; winnowing guarantees
# (shared-run detection, subset-of-shingles, density) are unit-tested
@query("doc_winnow_fingerprints")
def doc_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style winnowing fingerprints (k=5-gram hashes, w=4 window
    minima) per document + fingerprint count — the rolling-hash document
    signature for plagiarism/near-dup detection at 1/w shingle density."""
    docs = load_table(spark, sf_dir, "documents")
    fp = TX.winnow_fingerprints("text", k=5, w=4)
    # serialize the fingerprint set to a scalar string: the driver's
    # canonicalizer sorts result frames with pandas, which cannot
    # factorize list cells (round-1 harness crash) — array form stays
    # available to unit tests via TX.winnow_fingerprints directly
    return docs.select(
        "doc_id",
        F.concat_ws(",", F.transform(fp, lambda h: h.cast("string"))).alias(
            "fingerprints"
        ),
        F.size(fp).cast("bigint").alias("n_fingerprints"),
    ).orderBy("doc_id")


@query(
    "doc_token_chunks",
    """
    WITH toks AS (
        SELECT doc_id, str_split(text, ' ') AS t FROM documents
    ),
    starts AS (
        SELECT doc_id, t,
               UNNEST(generate_series(1, GREATEST(len(t), 1), 80)) AS s
        FROM toks
    )
    SELECT doc_id,
           CAST(s AS INTEGER) AS chunk_start,
           array_to_string(t[s:s+99], ' ') AS chunk,
           CAST(LEAST(len(t) - s + 1, 100) AS BIGINT) AS chunk_tokens
    FROM starts
    ORDER BY doc_id, chunk_start
    """,
)
def doc_token_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM-pipeline chunking: 100-token windows every 80 tokens (20
    overlap) per document, one row per chunk — the pre-embedding
    segmentation step, entirely JVM expressions + explode."""
    docs = load_table(spark, sf_dir, "documents")
    chunks = TX.token_chunks("text", chunk_size=100, stride=80)
    out = docs.select(
        "doc_id", F.posexplode(chunks).alias("pos", "chunk")
    ).select(
        "doc_id",
        (F.col("pos") * 80 + 1).cast("int").alias("chunk_start"),
        "chunk",
        (F.size(F.split("chunk", " "))).cast("bigint").alias("chunk_tokens"),
    )
    return out.orderBy("doc_id", "chunk_start")


@query(
    "doc_greedy_packing",
    """
    WITH sized AS (
        SELECT source, doc_id, len(str_split(text, ' ')) AS n_tokens
        FROM documents
    ),
    packed AS (
        SELECT source, doc_id, n_tokens,
               CAST(FLOOR((SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - 1) / 2048) AS INTEGER) AS bin_id
        FROM sized
    )
    SELECT source, bin_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
    FROM packed
    GROUP BY source, bin_id
    ORDER BY source, bin_id
    """,
)
def doc_greedy_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training batches: greedy cumulative-token
    binning to ~2048-token bins per source shard (window running sum →
    bin id → per-bin stats). The deterministic doc_id order makes the
    packing reproducible across partitionings."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "source", "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = sized.withColumn(
        "bin_id",
        F.floor((F.sum("n_tokens").over(w) - 1) / 2048).cast("int"),
    )
    return (
        packed.groupBy("source", "bin_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("bin_tokens"),
        )
        .orderBy("source", "bin_id")
    )


@query(
    "doc_unigram_logprob",
    """
    WITH tok AS (
        SELECT doc_id, UNNEST(STR_SPLIT(text, ' ')) AS term FROM documents
    ),
    counts AS (
        SELECT term, COUNT(*) AS cnt FROM tok GROUP BY term
    ),
    total AS (SELECT COUNT(*) AS n FROM tok)
    SELECT doc_id,
           CAST(SUM(CAST(ROUND(-LN(CAST(cnt AS DOUBLE) / n), 9)
                         AS DECIMAL(20,9))) AS DOUBLE)
               / COUNT(*) AS avg_neg_logprob,
           COUNT(*) AS n_tokens
    FROM tok JOIN counts USING (term) CROSS JOIN total
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def doc_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model scoring — mean −ln p(token) under the
    corpus unigram distribution, the cheap perplexity proxy used for
    LM-based quality filtering. One explode → count aggregate (small,
    broadcast back) → per-doc mean. Per-token ln is rounded to 9dp and
    summed in DECIMAL so the aggregate is order-independent and matches
    the oracle despite libm-vs-JVM last-ulp differences."""
    docs = load_table(spark, sf_dir, "documents")
    tok = TX.tokens_long(docs)
    counts = tok.groupBy("term").agg(F.count("*").alias("cnt"))
    n_total = tok.count()
    neg_ln = F.round(
        -F.log(F.col("cnt").cast("double") / F.lit(float(n_total))), 9
    ).cast("decimal(20,9)")
    return (
        tok.join(F.broadcast(counts), "term")
        .groupBy("doc_id")
        .agg(
            (F.sum(neg_ln).cast("double") / F.count("*")).alias(
                "avg_neg_logprob"
            ),
            F.count("*").alias("n_tokens"),
        )
        .orderBy("doc_id")
    )


@query(
    "doc_train_val_split",
    """
    WITH tagged AS (
        SELECT lang,
               CASE WHEN CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT)
                         % 100 < 90
                    THEN 'train' ELSE 'val' END AS split
        FROM documents
    )
    SELECT lang, split, COUNT(*) AS n_docs
    FROM tagged GROUP BY lang, split ORDER BY lang, split
    """,
)
def doc_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/10 train/val split by CONTENT hash (md5 prefix
    mod 100) — stable under re-sharding, re-ordering, and re-runs,
    unlike df.sample; identical docs always land in the same split, so
    the split can never leak near-duplicates across train/val after
    dedup. Per-(lang, split) counts."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("bigint") % 100
    tagged = docs.select(
        "lang",
        F.when(bucket < 90, "train").otherwise("val").alias("split"),
    )
    return (
        tagged.groupBy("lang", "split")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang", "split")
    )


@query(
    "doc_bpe_token_counts",
    """
    SELECT doc_id,
           CAST(LEN(STR_SPLIT(text, ' ')) AS BIGINT) AS ws_tokens,
           CAST(LEN(LIST_FILTER(regexp_split_to_array(text, '[^A-Za-z0-9'']+'),
                                t -> t <> '')) AS BIGINT) AS bpe_ish_tokens,
           CAST(LEN(LIST_DISTINCT(
               LIST_FILTER(regexp_split_to_array(text, '[^A-Za-z0-9'']+'),
                           t -> t <> ''))) AS BIGINT) AS bpe_ish_unique
    FROM documents
    ORDER BY doc_id
    """,
)
def doc_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting both ways (north-star §2.11): whitespace tokens vs
    the BPE-ish regex segmentation (word/digit pieces, punctuation
    dropped) — the ratio between the two is the standard
    chars-per-token sanity signal for corpus sizing."""
    docs = load_table(spark, sf_dir, "documents")
    bpe = TX.bpe_ish_tokens("text")
    return docs.select(
        "doc_id",
        TX.token_count("text").alias("ws_tokens"),
        F.size(bpe).cast("bigint").alias("bpe_ish_tokens"),
        F.size(F.array_distinct(bpe)).cast("bigint").alias("bpe_ish_unique"),
    ).orderBy("doc_id")

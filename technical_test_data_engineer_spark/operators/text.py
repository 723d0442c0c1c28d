"""Text-analysis operators for LLM-data pipelines (north-star §2.11):
tokenization, token stats, quality scoring, language ID, fingerprinting,
TF-IDF.

Everything is built-in-function-only (split/filter/transform/aggregate
— JVM-side, codegen'd). No Python touches row data: at 100 TB a
row-at-a-time Python tokenizer is the difference between hours and
weeks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from technical_test_data_engineer_spark.functions.hof import bind

# Deterministic marker vocabularies for the heuristic language scorer.
# The test corpus is an engine-vocabulary word soup (FIXTURES.md), so
# these markers are drawn from it to exercise the scoring machinery;
# swap in real stopword lists (en: the/and/of…, fr: le/la/et…) for real
# corpora. Keys sorted — the argmax tiebreak is alphabetical.
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["group", "merge", "window"],
    "en": ["the", "query", "data"],
    "es": ["table", "row", "scan"],
    "fr": ["join", "filter", "sort"],
    "zh": ["spark", "stream", "key"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in"]


def tokens(col: str | Column = "text", sep: str = " ") -> Column:
    """Whitespace tokenizer as a column expression (array<string>)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, sep)


def bpe_ish_tokens(col: str | Column = "text") -> Column:
    """BPE-ish subword proxy: split on word boundaries AND punctuation,
    keeping digits/word-pieces — a regex approximation of a learned
    tokenizer's segmentation for counting purposes."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"[^A-Za-z0-9']+"), lambda t: t != F.lit(""))


def token_count(col: str | Column = "text") -> Column:
    return F.size(tokens(col)).cast("bigint")


def unique_token_count(col: str | Column = "text") -> Column:
    return F.size(F.array_distinct(tokens(col))).cast("bigint")


def marker_hits(toks: Column, markers: list[str]) -> Column:
    """How many tokens fall in a marker vocabulary (JVM lambda filter)."""
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).cast("bigint")


def language_scores(toks: Column) -> dict[str, Column]:
    return {lang: marker_hits(toks, ms) for lang, ms in sorted(LANG_MARKERS.items())}


def predicted_language(toks: Column) -> Column:
    """Argmax over per-language marker-hit scores; ties break to the
    alphabetically-first language (deterministic, matching the oracle's
    CASE cascade)."""
    scores = language_scores(toks)
    langs = sorted(scores)
    expr: Column | None = None
    # build CASE WHEN score[l] >= all others THEN l, first-alpha wins ties
    cases = []
    for lang in langs:
        cond = None
        for other in langs:
            if other == lang:
                continue
            c = scores[lang] >= scores[other]
            cond = c if cond is None else (cond & c)
        cases.append((cond, F.lit(lang)))
    expr = F.when(cases[0][0], cases[0][1])
    for cond, val in cases[1:]:
        expr = expr.when(cond, val)
    return expr


def quality_columns(text_col: str = "text") -> list[Column]:
    """Quality-score battery: token count, mean token length, stopword
    ratio, distinct-token ratio. All exact-integer-derived doubles so
    cross-engine comparison is bit-stable."""
    toks = tokens(text_col)
    n_tok = F.size(toks).cast("bigint")
    n_char = F.length(text_col).cast("bigint")
    return [
        n_tok.alias("n_tokens"),
        (n_char.cast("double") / n_tok).alias("avg_token_len"),
        (marker_hits(toks, STOPWORDS).cast("double") / n_tok).alias("stopword_ratio"),
        (F.size(F.array_distinct(toks)).cast("double") / n_tok).alias(
            "distinct_ratio"
        ),
    ]


def fingerprint(col: str | Column = "text") -> Column:
    """Deterministic document fingerprint (md5 hex) for exact-dup
    detection and stable sharding."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c)


def tokens_long(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Explode to one row per (doc, token) — the long-form input for
    TF-IDF and n-gram statistics."""
    return df.select(id_col, F.explode(tokens(text_col)).alias("term"))


def md5_hash64(c: Column) -> Column:
    """Engine-portable 60-bit integer hash (first 15 hex digits of md5)
    — the same convention as the train/val split and hash sampling.
    Slower than xxhash64 but reproducible in DuckDB
    (``CAST('0x' || SUBSTRING(MD5(s), 1, 15) AS BIGINT)``), which makes
    hash-dependent operators oracle-pairable."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def md5_bucket(c: Column | str, n_buckets: int = 100) -> Column:
    """THE content-hash bucketing convention (first 8 hex digits of md5,
    mod ``n_buckets``): deterministic, engine-portable (DuckDB:
    ``CAST('0x' || SUBSTRING(MD5(s), 1, 8) AS BIGINT) % n``), and
    text-keyed so identical documents always land in the same bucket —
    the property the train/val split and hash-sampling queries rely on.
    Single definition so the split used by the contamination audit can
    never drift from the one used by the split queries."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("bigint") % n_buckets


def winnow_fingerprints(
    text_col: str | Column = "text", k: int = 5, w: int = 4, hash_fn=None
) -> Column:
    """Winnowing fingerprint set (Schleimer/Wilkerson/Aiken, the MOSS
    algorithm): hash every ``k``-token shingle (rolling k-gram), then
    keep the minimum hash of every ``w``-wide window — guaranteeing any
    shared run of ≥ w+k-1 tokens between two documents shares a selected
    hash, at ~1/w the fingerprint density of full shingling.

    Pure JVM expressions: shingle hashes via transform+xxhash64, window
    minima via transform over a position sequence + slice + array_min,
    dedup via array_distinct. Scan-side only — no shuffle, no Python.
    Both the token array and the hash array are let-bound via ``bind``
    so each is evaluated once per row (unbound, the window-minima
    lambda re-derives the whole hash array per window — quadratic;
    measured 14× slower).
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    h = hash_fn or F.xxhash64  # md5_hash64 for the oracle-paired twin

    def _with_toks(toks: Column) -> Column:
        n_sh = F.greatest(F.size(toks) - (k - 1), F.lit(1))
        idx = F.sequence(F.lit(1), n_sh)
        # slice+array_join, not element_at: ANSI-safe for docs < k tokens
        hashes = F.transform(
            idx, lambda i: h(F.array_join(F.slice(toks, i, k), " "))
        )

        def _with_hashes(h: Column) -> Column:
            n_win = F.greatest(F.size(h) - (w - 1), F.lit(1))
            wins = F.sequence(F.lit(1), n_win)
            return F.array_sort(
                F.array_distinct(
                    F.transform(wins, lambda i: F.array_min(F.slice(h, i, w)))
                )
            )

        return bind(hashes, _with_hashes)

    return bind(F.split(c, " "), _with_toks)


def token_ngrams(text_col: str | Column = "text", n: int = 2) -> Column:
    """ALL word n-grams in order, repeats kept (array<string>) — the
    counting form for repetition metrics, vs ``dedup.word_shingles``
    which dedups for set similarity. ANSI-safe slice+array_join grams;
    token array let-bound (split runs once per row)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col

    def _with_toks(toks: Column) -> Column:
        idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1)))
        return F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))

    return bind(F.split(c, " "), _with_toks)


# audit patterns (PII-ish plumbing): keep the regex subset common to
# Java regex (Spark) and RE2 (DuckDB) — char classes, +, {m,}, no
# lookaround — so every count is oracle-checkable
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^ ]+"
DIGIT_RUN_RE = r"[0-9]{6,}"


def pattern_count(text_col: str | Column, pattern: str) -> Column:
    """Occurrences of ``pattern`` in the text (vectorized JVM regex;
    the building block for PII audits / scrub decisions)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(0))).cast(
        "bigint"
    )


def charclass_columns(text_col: str = "text") -> list[Column]:
    """C4-style character-class token ratios: digit-only tokens and
    tokens containing any non-alphanumeric symbol, as counts + ratios.
    Exact-int ÷ exact-int doubles, bit-stable across engines."""
    toks = tokens(text_col)
    n_tok = F.size(toks).cast("bigint")
    n_digit = F.size(
        F.filter(toks, lambda t: t.rlike(r"^[0-9]+$"))
    ).cast("bigint")
    n_symbol = F.size(
        F.filter(toks, lambda t: t.rlike(r"[^A-Za-z0-9]"))
    ).cast("bigint")
    return [
        n_tok.alias("n_tokens"),
        n_digit.alias("n_digit_tokens"),
        n_symbol.alias("n_symbol_tokens"),
        (n_digit.cast("double") / n_tok).alias("digit_token_ratio"),
        (n_symbol.cast("double") / n_tok).alias("symbol_token_ratio"),
    ]


def token_chunks(
    text_col: str | Column = "text", chunk_size: int = 100, stride: int = 80
) -> Column:
    """Overlapping token-window chunks (array<string>): windows of
    ``chunk_size`` tokens every ``stride`` tokens — the chunking step
    before embedding/indexing long documents. Pure JVM expressions
    (sequence → slice → array_join); explode the result for one row per
    chunk. Chunks shorter than ``chunk_size`` appear only at the tail.
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col

    def _with_toks(toks: Column) -> Column:
        starts = F.sequence(
            F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(stride)
        )
        return F.transform(
            starts, lambda s: F.array_join(F.slice(toks, s, chunk_size), " ")
        )

    # bind: without it the slice lambda re-runs split() once per chunk
    return bind(F.split(c, " "), _with_toks)

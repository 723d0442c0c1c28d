"""Privacy / governance queries (the release-audit side of a training
corpus: k-anonymity, l-diversity, differentially-private releases).

The reference pipeline publishes scraped per-entity aggregates straight
to a store (`/root/reference/scraper.py`); a production corpus release
adds a privacy gate in front of that publish. These queries are that
gate, each as one keyed-shuffle aggregation with the noise / flagging
arithmetic scan-side, and each oracle-paired via the repo's
engine-portable md5 conventions (operators/text.md5_hash64).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from technical_test_data_engineer_spark.plans.star_queries import query
from technical_test_data_engineer_spark.sources.parquet_source import load_table

# k-anonymity group-size floor and l-diversity distinct-sensitive floor
# (Sweeney 2002; Machanavajjhala et al. 2007).
K_ANON = 5
L_DIV = 3
# DP release: Laplace(sensitivity/eps) on counting queries (Dwork 2006).
DP_EPS = 1.0
# 15 hex digits of md5 = 60 bits — the repo's engine-portable hash.
_TWO_60 = float(1 << 60)

# Quasi-identifier banding: coarse account-balance band so the
# quasi-id tuple is realistic (exact balances would make every row its
# own group). FLOOR of a negative quotient agrees across engines.
_BAND_WIDTH = 2000


def _acct_band(col: str = "c_acctbal") -> F.Column:
    return F.floor(F.col(col) / _BAND_WIDTH).cast("bigint")


_ACCT_BAND_SQL = f"CAST(FLOOR(c_acctbal / {_BAND_WIDTH}) AS BIGINT)"


@query(
    "customer_k_anonymity",
    f"""
    SELECT c_nationkey,
           c_mktsegment,
           {_ACCT_BAND_SQL} AS acct_band,
           CAST(COUNT(*) AS BIGINT) AS group_size,
           COUNT(*) < {K_ANON} AS at_risk
    FROM customer
    GROUP BY c_nationkey, c_mktsegment, acct_band
    ORDER BY c_nationkey, c_mktsegment, acct_band
    """,
)
def customer_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (Sweeney 2002): group the table by its
    quasi-identifier tuple (nation, market segment, account-balance
    band) and flag every group smaller than k={K_ANON} — those rows are
    re-identifiable by linking the quasi-ids to an external dataset,
    so a release gate must suppress or generalize them. One keyed
    shuffle over the quasi-id tuple; the flag is a scan-side
    comparison on the aggregated counts. At 100 TB the group-key
    cardinality is the product of quasi-id domains (bounded, ~10^4
    here), never the row count — the aggregation is the classic
    map-side-combine shape AQE handles without help."""
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.groupBy(
            "c_nationkey", "c_mktsegment", _acct_band().alias("acct_band")
        )
        .agg(F.count("*").alias("group_size"))
        .withColumn("at_risk", F.col("group_size") < K_ANON)
        .orderBy("c_nationkey", "c_mktsegment", "acct_band")
    )


@query(
    "nation_l_diversity",
    f"""
    SELECT c_nationkey,
           {_ACCT_BAND_SQL} AS acct_band,
           CAST(COUNT(*) AS BIGINT) AS group_size,
           CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS n_sensitive,
           COUNT(DISTINCT c_mktsegment) >= {L_DIV} AS l_diverse
    FROM customer
    GROUP BY c_nationkey, acct_band
    ORDER BY c_nationkey, acct_band
    """,
)
def nation_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007): k-anonymity's
    complement — a group can be large yet still leak if every member
    shares the same SENSITIVE value (homogeneity attack). Per
    quasi-id group (nation, balance band), count distinct values of
    the sensitive attribute (market segment) and flag groups with
    fewer than l={L_DIV}. COUNT(DISTINCT) inside a group-by is the
    two-phase partial-distinct shape Spark plans natively (expand +
    two-stage agg) — no extra shuffle beyond the group key at scale."""
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_nationkey", _acct_band().alias("acct_band"))
        .agg(
            F.count("*").alias("group_size"),
            F.count_distinct("c_mktsegment").alias("n_sensitive"),
        )
        .withColumn("l_diverse", F.col("n_sensitive") >= L_DIV)
        .orderBy("c_nationkey", "acct_band")
    )


@query(
    "dp_noisy_counts",
    f"""
    WITH g AS (
        SELECT c_nationkey, c_mktsegment, COUNT(*) AS true_count
        FROM customer
        GROUP BY c_nationkey, c_mktsegment
    ),
    u AS (
        SELECT *,
               (CAST(('0x' || SUBSTRING(MD5(
                    CAST(c_nationkey AS VARCHAR) || '|' || c_mktsegment
                ), 1, 15)) AS BIGINT) + 0.5) / {_TWO_60!r} AS u
        FROM g
    )
    SELECT c_nationkey,
           c_mktsegment,
           CAST(true_count AS BIGINT) AS true_count,
           ROUND(
               true_count
               - (1.0 / {DP_EPS!r})
                 * (CASE WHEN u >= 0.5 THEN 1.0 ELSE -1.0 END)
                 * LN(1.0 - 2.0 * ABS(u - 0.5)),
               6
           ) AS noisy_count
    FROM u
    ORDER BY c_nationkey, c_mktsegment
    """,
)
def dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private histogram release (Dwork 2006): per
    (nation, segment) cell count plus Laplace(1/eps) noise, eps=
    {DP_EPS} (sensitivity 1 for a counting query). The noise draw is
    DETERMINISTIC: the uniform comes from the repo's engine-portable
    md5 convention on the group key ((h + 0.5) / 2^60, so u is in the
    open interval and LN never sees 0), pushed through the inverse
    Laplace CDF -b*sign(u-1/2)*ln(1-2|u-1/2|). Seeded-by-key noise is
    how a distributed DP release stays reproducible across retries and
    engines — rand() would break both the oracle pairing and
    re-computation on task retry (a correctness bug in a real
    release, not just a test artifact). Rounded to 6 decimals so both
    engines' libm ulp differences cannot reach the hash. true_count is
    retained HERE because the proof checks calibration; a production
    release projects it away. Plan: one keyed shuffle; the noise is
    scan-side arithmetic on the aggregated (vocabulary-sized) frame."""
    cust = load_table(spark, sf_dir, "customer")
    g = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").alias("true_count")
    )
    key = F.concat_ws(
        "|", F.col("c_nationkey").cast("string"), F.col("c_mktsegment")
    )
    h = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("bigint")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(_TWO_60)
    sign = F.when(u >= 0.5, F.lit(1.0)).otherwise(F.lit(-1.0))
    noise = (
        F.lit(-1.0 / DP_EPS)
        * sign
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u - F.lit(0.5)))
    )
    return (
        g.select(
            "c_nationkey",
            "c_mktsegment",
            F.col("true_count").cast("bigint").alias("true_count"),
            F.round(F.col("true_count") + noise, 6).alias("noisy_count"),
        )
        .orderBy("c_nationkey", "c_mktsegment")
    )


# Pseudonymization salt: a FIXED literal here so the proof is
# reproducible and oracle-pairable. A production deployment injects a
# keyed secret (HMAC) from a vault instead — the plan shape is
# identical, only the key expression changes.
_PSEUDO_SALT = "spark-graft-v1"


@query(
    "customer_pseudonymized",
    f"""
    SELECT 'cust-' || SUBSTRING(
               MD5('{_PSEUDO_SALT}|' || CAST(c_custkey AS VARCHAR)), 1, 12
           ) AS pseudo_id,
           'p-' || SUBSTRING(
               MD5('{_PSEUDO_SALT}|' || c_name), 1, 12
           ) AS pseudo_name,
           c_nationkey,
           c_mktsegment,
           {_ACCT_BAND_SQL} AS acct_band
    FROM customer
    ORDER BY pseudo_id
    """,
)
def customer_pseudonymized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudonymized publish view — the third leg of the privacy
    family (audit: customer_k_anonymity / nation_l_diversity; noisy
    aggregate release: dp_noisy_counts; row-level release: THIS).
    Direct identifiers are replaced by salted-hash pseudonyms
    (deterministic, so joins across published tables still link —
    the GDPR 'pseudonymisation' standard, reversible only with the
    salt), and the quantitative quasi-identifier is generalized to the
    same band the k-anonymity audit groups by, so the audit's group
    sizes apply verbatim to this view. Pure scan-side expressions —
    zero shuffle at any scale (the ORDER BY is presentation-only); the
    erasure complement (actually deleting on request) is
    sources/maintenance.rtbf_delete."""
    cust = load_table(spark, sf_dir, "customer")
    salted = lambda c: F.concat(F.lit(_PSEUDO_SALT + "|"), c)  # noqa: E731
    return (
        cust.select(
            F.concat(
                F.lit("cust-"),
                F.substring(
                    F.md5(salted(F.col("c_custkey").cast("string"))), 1, 12
                ),
            ).alias("pseudo_id"),
            F.concat(
                F.lit("p-"),
                F.substring(F.md5(salted(F.col("c_name"))), 1, 12),
            ).alias("pseudo_name"),
            "c_nationkey",
            "c_mktsegment",
            _acct_band().alias("acct_band"),
        )
        .orderBy("pseudo_id")
    )


# t-closeness threshold on the total-variation distance (Li, Li &
# Venkatasubramanian 2007 use EMD; for a categorical sensitive
# attribute with uniform ground distance EMD = TVD).
T_CLOSE = 0.2


@query(
    "nation_t_closeness",
    f"""
    WITH cells AS (
        SELECT c_nationkey, {_ACCT_BAND_SQL} AS acct_band, c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM customer
        GROUP BY 1, 2, 3
    ),
    grp AS (
        SELECT c_nationkey, acct_band, CAST(SUM(c) AS BIGINT) AS n_g
        FROM cells GROUP BY 1, 2
    ),
    seg AS (
        SELECT c_mktsegment, CAST(SUM(c) AS BIGINT) AS n_s
        FROM cells GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells),
    grid AS (
        SELECT g.c_nationkey, g.acct_band, g.n_g,
               s.c_mktsegment, s.n_s, t.n,
               COALESCE(cl.c, 0) AS c
        FROM grp g
        CROSS JOIN seg s
        CROSS JOIN tot t
        LEFT JOIN cells cl
          ON cl.c_nationkey = g.c_nationkey
         AND cl.acct_band = g.acct_band
         AND cl.c_mktsegment = s.c_mktsegment
    ),
    d AS (
        SELECT c_nationkey, acct_band,
               CAST(MAX(n_g) AS BIGINT) AS group_size,
               ROUND(0.5 * CAST(SUM(CAST(ROUND(ABS(
                   CAST(c AS DOUBLE) / n_g - CAST(n_s AS DOUBLE) / n
               ), 12) AS DECIMAL(30,15))) AS DOUBLE), 6) AS tvd
        FROM grid
        GROUP BY 1, 2
    )
    SELECT c_nationkey, acct_band, group_size, tvd,
           tvd <= {T_CLOSE} AS t_close
    FROM d
    ORDER BY c_nationkey, acct_band
    """,
)
def nation_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007) — the third
    leg of the privacy triad beside `customer_k_anonymity` and
    `nation_l_diversity`: a group can be large (k) and varied (l) yet
    still leak if its SENSITIVE-attribute distribution diverges from
    the table's (skewness attack: 'this nation+band is 90% BUILDING' is
    a disclosure even with all 5 segments present). Per quasi-id group,
    the total-variation distance between the group's market-segment
    distribution and the global one (for categorical sensitive values
    with uniform ground distance, EMD — the paper's measure — IS TVD),
    flagged at t={T_CLOSE}. Plan: ONE scan to the (quasi-id × segment)
    cell grid (bounded by attribute domains, never rows); group totals,
    segment totals, the corpus total, and the dense grid (absent cells
    count — |0 − p_s| contributes) all derive from that persisted cell
    frame via bounded cross joins; each |Δp| is rounded then
    DECIMAL-summed (order-free), and the flag compares the ROUNDED tvd
    so both engines gate identically. TVD ≥ 0, so no signed-zero
    exposure."""
    cust = load_table(spark, sf_dir, "customer")
    cells = (
        cust.groupBy(
            "c_nationkey",
            _acct_band().alias("acct_band"),
            "c_mktsegment",
        )
        .agg(F.count("*").cast("bigint").alias("c"))
        .persist()  # feeds grp, seg, tot AND the dense-grid left join
    )
    grp = cells.groupBy("c_nationkey", "acct_band").agg(
        F.sum("c").cast("bigint").alias("n_g")
    )
    seg = cells.groupBy("c_mktsegment").agg(
        F.sum("c").cast("bigint").alias("n_s")
    )
    tot = cells.agg(F.sum("c").cast("bigint").alias("n"))
    grid = (
        grp.crossJoin(F.broadcast(seg))
        .crossJoin(F.broadcast(tot))
        .join(
            cells,
            ["c_nationkey", "acct_band", "c_mktsegment"],
            "left",
        )
        .select(
            "c_nationkey",
            "acct_band",
            "n_g",
            "n_s",
            "n",
            F.coalesce(F.col("c"), F.lit(0)).alias("c"),
        )
    )
    term = F.round(
        F.abs(
            F.col("c").cast("double") / F.col("n_g")
            - F.col("n_s").cast("double") / F.col("n")
        ),
        12,
    ).cast("decimal(30,15)")
    d = grid.groupBy("c_nationkey", "acct_band").agg(
        F.max("n_g").cast("bigint").alias("group_size"),
        F.round(0.5 * F.sum(term).cast("double"), 6).alias("tvd"),
    )
    return d.select(
        "c_nationkey",
        "acct_band",
        "group_size",
        "tvd",
        (F.col("tvd") <= T_CLOSE).alias("t_close"),
    ).orderBy("c_nationkey", "acct_band")

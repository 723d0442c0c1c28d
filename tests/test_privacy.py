"""Privacy/governance family: semantic invariants the DuckDB oracle
cannot express (noise calibration, flag consistency, LOO algebra) plus
determinism of the seeded-Laplace release."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from technical_test_data_engineer_spark.plans.privacy_queries import (
    DP_EPS,
    K_ANON,
    L_DIV,
    customer_k_anonymity,
    dp_noisy_counts,
    nation_l_diversity,
)
from technical_test_data_engineer_spark.plans.text_queries import (
    source_loo_impact,
)

SF = "/root/testdata/sf0.01"


def test_k_anonymity_partitions_the_table(spark):
    out = customer_k_anonymity(spark, SF).collect()
    n_rows = spark.read.parquet(f"{SF}/customer.parquet").count()
    assert sum(r.group_size for r in out) == n_rows
    for r in out:
        assert r.at_risk == (r.group_size < K_ANON)


def test_l_diversity_bounds(spark):
    for r in nation_l_diversity(spark, SF).collect():
        assert 1 <= r.n_sensitive <= min(r.group_size, 5)  # 5 segments
        assert r.l_diverse == (r.n_sensitive >= L_DIV)


def test_dp_noise_is_deterministic_and_laplace_calibrated(spark):
    a = {(r.c_nationkey, r.c_mktsegment): r.noisy_count
         for r in dp_noisy_counts(spark, SF).collect()}
    b = {(r.c_nationkey, r.c_mktsegment): r.noisy_count
         for r in dp_noisy_counts(spark, SF).collect()}
    assert a == b  # seeded noise: identical across runs (task-retry safe)

    out = dp_noisy_counts(spark, SF).collect()
    residuals = [abs(r.noisy_count - r.true_count) for r in out]
    # Laplace(b=1/eps): median |noise| = b*ln2 ~ 0.693, mean = b = 1.
    # With 125 cells the empirical mean must land well inside [0.4, 2.5]
    # and at least one cell must exceed the median (non-degenerate).
    mean_abs = sum(residuals) / len(residuals)
    assert 0.4 < mean_abs < 2.5, mean_abs
    assert max(residuals) > math.log(2) / DP_EPS
    assert min(residuals) > 0  # u=(h+0.5)/2^60 never hits the CDF pole


def test_source_loo_identity(spark):
    out = source_loo_impact(spark, SF).collect()
    n_all = sum(r.n_docs for r in out)
    s_all = sum(r.sum_tokens for r in out)
    assert n_all == spark.read.parquet(f"{SF}/documents.parquet").count()
    for r in out:
        expect = (s_all - r.sum_tokens) / (n_all - r.n_docs) - s_all / n_all
        assert abs(r.loo_delta - round(expect, 6)) < 1e-9
        # dropping an above-average source lowers the mean and vice versa
        src_mean = r.sum_tokens / r.n_docs
        if src_mean > s_all / n_all:
            assert r.loo_delta <= 0
        else:
            assert r.loo_delta >= 0


def test_source_loo_single_source_corpus_is_null_safe(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "a b c", "en", "only", 5), (2, "d e", "en", "only", 3)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.parquet(f"{tmp_path}/documents.parquet")
    out = source_loo_impact(spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert out[0].mean_without is None and out[0].loo_delta is None


def test_pseudonymization_is_deterministic_and_linkable(spark):
    from technical_test_data_engineer_spark.plans.privacy_queries import (
        customer_pseudonymized,
    )

    out = customer_pseudonymized(spark, SF).collect()
    n = spark.read.parquet(f"{SF}/customer.parquet").count()
    # bijective on ids: same row count, no pseudo_id collisions — the
    # property that keeps cross-table joins linkable after release
    assert len(out) == n
    assert len({r.pseudo_id for r in out}) == n
    again = {r.pseudo_id for r in customer_pseudonymized(spark, SF).collect()}
    assert {r.pseudo_id for r in out} == again  # deterministic
    # no direct identifier survives
    cols = customer_pseudonymized(spark, SF).columns
    assert "c_name" not in cols and "c_custkey" not in cols


def test_js_divergence_bounds_and_self_zero(spark, tmp_path):
    import math

    from technical_test_data_engineer_spark.plans.text_queries import (
        source_token_js_divergence,
    )

    out = source_token_js_divergence(spark, SF).collect()
    assert len(out) > 1
    for r in out:
        assert 0.0 <= r.js_divergence <= math.log(2) + 1e-9
    # a single-source corpus IS the corpus distribution -> JS == 0
    docs = spark.createDataFrame(
        [(1, "a b b c", "en", "only", 7), (2, "a c", "en", "only", 3)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.parquet(f"{tmp_path}/documents.parquet")
    solo = source_token_js_divergence(spark, str(tmp_path)).collect()
    assert len(solo) == 1 and solo[0].js_divergence == 0.0


def test_neyman_allocation_sums_within_budget_and_ranks_hold(spark):
    from collections import Counter

    from technical_test_data_engineer_spark.plans.text_queries import (
        NEYMAN_BUDGET,
        doc_neyman_sample,
    )

    out = doc_neyman_sample(spark, SF).collect()
    per_lang = Counter(r.lang for r in out)
    allocs = {r.lang: r.alloc for r in out}
    # emitted rows per stratum == its allocation; floor keeps the
    # total at or under budget
    for lang, n in per_lang.items():
        assert n == allocs[lang], (lang, n, allocs[lang])
    assert sum(per_lang.values()) <= NEYMAN_BUDGET
    assert len(out) == len({r.doc_id for r in out})  # no doc twice


"""Query registry: importing this package registers every query module
into ``star_queries.QUERIES`` / ``star_queries.ORACLE``.

Registry ORDER is part of the driver contract: the correctness gate
checks the first 50 entries only (round-1 lesson — 23 oracle-paired
queries, including every TPC-H shape, sat outside the window and earned
no driver credit). ``_FRONT_50`` pins the 50 most operator-distinctive
oracle-paired queries into the window; remaining oracle-paired queries
follow (locally verified via verify_local.py), rows-only queries last.
"""

from technical_test_data_engineer_spark.plans.star_queries import (  # noqa: F401
    ORACLE,
    QUERIES,
    flagship,
)
from technical_test_data_engineer_spark.plans import (  # noqa: F401
    dedup_queries,
    multimodal_queries,
    parity_queries,
    privacy_queries,
    relational_breadth_queries,
    similarity_queries,
    streaming_queries,
    text_queries,
    tpch_extra_queries,
    tpch_queries,
    window_queries,
)

# One query per unique operator proof, most-distinctive first. Every
# entry must be oracle-paired. Queries NOT listed here remain registered
# and locally verified — they are the ones whose operators are already
# proven by an in-window query (e.g. cheapest_part_per_brand duplicates
# top_order_per_customer's W1 top-1-per-group proof).
# Round-4 rotation (verdict item 5): the 16 oracle-paired queries that
# had never earned a driver-green row rotate IN; after this round every
# oracle-paired query has been driver-checked in some round. Displaced
# queries (all green in r03, all with an in-window twin for their
# operator proof): q8/q9 (join chains — q5, q3), q11/q15/q20 (scalar+agg
# subqueries — q18's having-subquery, q21's semi+anti,
# customers_without_orders' anti), q13 (left join + count distribution —
# customers_per_nation_left), order_gap_days (lag — customer_value_ranks
# rank battery, verdict's own pairing), events_campaign_attribution /
# events_gapfilled_by_type (range join + gap-fill — view_click_within_30m
# interval join + events_gapfilled_hourly rotating in),
# user_conversion_funnel / weekly_retention_cohorts (event-time staged
# aggs — events_tumbling_30m + events_user_sessions), doc_quality_scores
# (length/ratio battery — doc_gopher_filter + doc_charclass_stats
# rotating in), doc_unigram_logprob (token counting + log weighting —
# doc_bpe_token_counts + tfidf_top_terms), minhash_near_dups_md5 (whole
# md5 MinHash pipeline — split_contamination_audit_md5 AND
# minhash_incremental_md5 rotating in recompute every stage),
# dedup_clusters_exact (CC over exact all-pairs edges —
# neardup_keeper_docs rotating in carries the same all-pairs oracle, and
# dedup_clusters stays), knn_lsh_exact (SRP bucketing + exact scoring —
# embedding_near_dups_lsh_exact's generated bucketing oracle stays).
_FRONT_50 = [
    # ==== Round-13 rotation (r12 verdict item 1, recomputed from the
    # mechanical CORRECTNESS_r01..r12 union — latest-green counts at
    # the r12 close: r05×1, r06×39, r07×44, ...). Composition, in
    # order: (1) the rotation head pre-listed at the r12 close —
    # view_click_dwell_overlaps (the one r05 green) + the full 39-query
    # r06 cohort; (2) this round's one changed pair (oracle
    # regeneration — never driver-green in its current form); (3) the
    # oldest r07 greens to fill 50 (first-green r01 first, then
    # alphabetical, preferring the r12 watch items).
    # The remaining 40 r07 greens are the r14 rotation head.
    # -- the one r05 green --
    "view_click_dwell_overlaps",
    # -- the r06 cohort (39, alphabetical) --
    "ab_test_cuped",
    "copurchase_degree_stats",
    "corpus_drift_psi",
    "customer_k_anonymity",
    "customer_pseudonymized",
    "customer_revenue_gini",
    "customer_rfm_segments",
    "doc_epoch_shards",
    "doc_neyman_sample",
    "doc_pii_redacted",
    "doc_readability",
    "doc_template_keys",
    "doc_token_ids",
    "dp_noisy_counts",
    "eval_ngram_contamination",
    "eval_substring_contamination",
    "event_transition_probs",
    "hard_negative_mining",
    "hourly_traffic_anomalies",
    "knn_maxsim_late_interaction",
    "lineitem_bloom_prune_revenue",
    "nation_l_diversity",
    "orderkey_skew_report",
    "orders_benford_audit",
    "part_cf_similarity",
    "part_label_propagation",
    "part_name_entities",
    "price_quantity_elasticity",
    "q12_ship_class_priority",
    "segment_price_geomean",
    "ship_latency_percentiles",
    "source_dedup_report",
    "source_loo_impact",
    "source_score_calibration",
    "source_token_js_divergence",
    "user_conversion_survival",
    "view_click_full_outer_30m",
    "vocab_growth_curve",
    "vocab_zipf_slope",
    # -- re-earn: r13 changed pair (the round's only plan whose
    #    current form was never driver-green) --
    "ingest_loop_exactly_once",     # bound 448→256 + session-suffixed
                                    # tables + probe-skip (oracle regen)
    # -- re-earn: oldest r07 greens (first-green r01 first, then the
    #    r12 watch items, then alphabetical; part_record_linkage_
    #    scores' count-fusion was A/B-measured SLOWER and reverted —
    #    byte-identical r12 plan, refreshes as ordinary r07 debt) --
    "part_record_linkage_scores",
    "events_sliding_1h_15m",        # first-green r01
    "flagship_daily_backlog",       # first-green r01
    "order_value_poisson_bootstrap",  # r12 driver flag (plan unchanged
                                    # — root-caused in BASELINE.md r13)
    "shard_balance_chisq",          # r12 watch item
    "ab_test_covariate_balance",
    "ab_test_ipw_ate",
    "ab_test_sprt",
    # -- re-earn: r13 plan rewrite (replaces the last r07 filler,
    #    ab_test_uplift_deciles, which returns to the r14 head) --
    "lineitem_spearman_corr",       # per-axis-cardinality rank shape
                                    # (7.4 -> 2.2 s; oracle unchanged)
]


# Earlier windows (rotation rationale for rounds 4-8) are preserved in
# git history — see _FRONT_50 at commits 9688206 (r7) / 97a6b66 (r8).

# Rows-only queries deliberately pinned into the driver window: NONE
# since round 7 — the r6 rotation proved the driver scores rows-only
# window entries err=no_oracle (zero credit). Every _FRONT_50 entry
# must be oracle-paired; this set stays for the mechanism.
# Round-14 rotation head (after the r13 window lands): the 41
# remaining r07 greens (44 minus the three in this window), plus any
# r13 additions that miss the r13 window and any plan rewritten after
# its r13 green.

_FRONT_ROWS_ONLY: set[str] = set()


def _reorder() -> None:
    missing = [n for n in _FRONT_50 if n not in QUERIES]
    unpaired = [
        n for n in _FRONT_50
        if n not in ORACLE and n not in _FRONT_ROWS_ONLY
    ]
    if missing or unpaired:
        raise RuntimeError(
            f"registry front-window broken: missing={missing} unpaired={unpaired}"
        )
    ordered = {n: QUERIES[n] for n in _FRONT_50}
    for n, fn in QUERIES.items():  # remaining oracle-paired, stable order
        if n not in ordered and n in ORACLE:
            ordered[n] = fn
    for n, fn in QUERIES.items():  # rows-only last
        if n not in ordered:
            ordered[n] = fn
    QUERIES.clear()
    QUERIES.update(ordered)


_reorder()

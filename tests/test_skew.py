"""Skew-aware execution evidence (round-3 verdict item 7): the band
self-join — the one shuffle shape in the dedup path whose key
distribution is data-dependent — re-plans under AQE skew-join when a
bucket key dominates. The hot-bucket CAP (operators/dedup.py) removes
degenerate m² buckets outright; AQE skew splitting is the second line
of defense for buckets that are hot but legitimate (below the cap, yet
far above the median partition). README §production knobs documents the
thresholds a 100 TB run would tune."""

from __future__ import annotations

from pyspark.sql import functions as F

_SKEW_CONFS = {
    # force the shuffle join (the corpus band relation would never be
    # broadcast at scale) and make the local fixture's sizes cross the
    # skew thresholds the way a multi-GB hot bucket does in production
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
}


def test_band_join_replans_under_aqe_skew(spark):
    saved = {k: spark.conf.get(k, None) for k in _SKEW_CONFS}
    try:
        for k, v in _SKEW_CONFS.items():
            spark.conf.set(k, v)
        # banded-relation shape: (id, band-bucket key) light rows, one
        # key holding 80% of the corpus — the distribution a templated
        # corpus produces under MinHash banding
        banded = spark.range(0, 100000).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") < 80000, F.lit(0))
            .otherwise(F.col("id") % 1000)
            .alias("_bh"),
        )
        probe = spark.range(0, 1000).select(F.col("id").alias("_bh"))
        j = banded.join(probe, "_bh")
        assert len(j.collect()) == 100000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
        assert "skewed" in plan, plan  # AQEShuffleRead split the bucket
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

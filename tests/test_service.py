"""QueryService — the reference's interactive session surface (E2/E3):
prepare-once caching, widget helpers, the four parametrized plot
queries, refresh invalidation."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from technical_test_data_engineer_spark.service import QueryService

DAY = dt.date(1997, 6, 15)


def _svc(spark, sf_dir):
    return QueryService(spark, sf_dir)


def test_prepare_is_cached_and_stable(spark, sf_dir):
    svc = _svc(spark, sf_dir)
    df1 = svc.prepare()
    df2 = svc.prepare()
    assert df1 is df2  # memoized, like st.session_state.df
    assert df1.storageLevel.useMemory
    n = df1.count()
    assert n > 0
    svc.refresh()
    assert svc.prepare().count() == n


def test_widget_helpers(spark, sf_dir):
    svc = _svc(spark, sf_dir)
    lo, hi = svc.date_bounds()
    assert lo <= hi
    legend = svc.priority_legend()
    assert sum(legend.values()) == svc.prepare().count()
    nations = svc.nation_options()
    assert nations == sorted(nations) and len(nations) > 0


def test_plot1_counts_each_customer_once(spark, sf_dir):
    svc = _svc(spark, sf_dir)
    out = svc.plot1_priority_histogram(DAY)
    total = sum(r["nb_customers"] for r in out.collect())
    active_customers = (
        svc.prepare()
        .filter((F.col("debut") <= F.lit(DAY)) & (F.lit(DAY) <= F.col("fin")))
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert total == active_customers


def test_plot2_keeps_all_nations(spark, sf_dir):
    svc = _svc(spark, sf_dir)
    out = svc.plot2_nation_breakdown(DAY).collect()
    assert len(out) == len(svc.nation_options())
    assert all(r["nb_customers"] >= 0 for r in out)
    # IN-list narrowing
    pick = svc.nation_options()[:2]
    narrowed = svc.plot2_nation_breakdown(DAY, nations=pick)
    active = {r["nation"] for r in narrowed.collect() if r["nb_customers"] > 0}
    assert active <= set(pick)


def test_plot3_single_entity(spark, sf_dir):
    svc = _svc(spark, sf_dir)
    some_cust = svc.prepare().select("o_custkey").first()[0]
    rows = svc.plot3_entity_gantt(some_cust).collect()
    assert rows
    assert all(r["duration_days"] >= 1 for r in rows)


def test_plot4_matches_pointwise_count(spark, sf_dir):
    """The delta/prefix-sum series at a sampled day must equal a direct
    interval-containment count for that day."""
    svc = _svc(spark, sf_dir)
    series = svc.plot4_daily_series()
    got = {
        r["c_mktsegment"]: r["n_active"]
        for r in series.filter(F.col("day") == F.lit(DAY)).collect()
    }
    direct = {
        r["c_mktsegment"]: r["n"]
        for r in svc.prepare()
        .filter((F.col("debut") <= F.lit(DAY)) & (F.lit(DAY) <= F.col("fin")))
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == direct

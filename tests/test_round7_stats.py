"""Twin-consistency tests for the round-7 statistical operators:
each Spark implementation is checked against an INDEPENDENT pandas/
numpy computation of the same statistic on the same fixture (the
SURVEY §5 discipline — the DuckDB oracle proves engine parity, these
prove the statistic itself is the textbook one)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from technical_test_data_engineer_spark.plans import QUERIES


def test_spearman_matches_pandas(spark, sf_dir):
    row = QUERIES["lineitem_spearman_corr"](spark, sf_dir).collect()[0]
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")[
        ["l_quantity", "l_extendedprice"]
    ]
    assert row["n_rows"] == len(li)
    assert row["pearson"] == pytest.approx(
        li["l_quantity"].corr(li["l_extendedprice"]), abs=1e-6
    )
    # spearman = pearson on average ranks (scipy-free reference)
    rx = li["l_quantity"].rank(method="average")
    ry = li["l_extendedprice"].rank(method="average")
    assert row["spearman"] == pytest.approx(rx.corr(ry), abs=1e-6)


def test_kendall_matches_pandas(spark, sf_dir):
    row = QUERIES["daily_revenue_kendall_tau"](spark, sf_dir).collect()[0]
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    daily = o.groupby(o["o_orderdate"].astype("datetime64[ns]").dt.date).agg(
        rev=("o_totalprice", "sum"), cnt=("o_orderkey", "count")
    )
    # scipy-free tau-b reference: O(n^2) concordance count via numpy
    rev = daily["rev"].to_numpy()
    cnt = daily["cnt"].to_numpy()
    sx = np.sign(rev[:, None] - rev[None, :])
    sy = np.sign(cnt[:, None] - cnt[None, :])
    iu = np.triu_indices(len(rev), k=1)
    nc = int(((sx * sy)[iu] > 0).sum())
    nd = int(((sx * sy)[iu] < 0).sum())
    tx = int((sx[iu] == 0).sum())
    ty = int((sy[iu] == 0).sum())
    n_pairs = len(iu[0])
    tau_b = (nc - nd) / math.sqrt((n_pairs - tx) * (n_pairs - ty))
    assert row["n_pairs"] == n_pairs
    assert row["n_concordant"] == nc
    assert row["n_discordant"] == nd
    assert row["kendall_tau_b"] == pytest.approx(tau_b, abs=1e-6)


def test_theil_matches_numpy(spark, sf_dir):
    row = QUERIES["customer_theil_index"](spark, sf_dir).collect()[0]
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    x = o.groupby("o_custkey")["o_totalprice"].sum().to_numpy()
    mu = x.mean()
    t = float(np.mean(x / mu * np.log(x / mu)))
    l = float(np.mean(np.log(mu / x)))
    assert row["n_customers"] == len(x)
    assert row["theil_t"] == pytest.approx(t, abs=1e-6)
    assert row["theil_l"] == pytest.approx(l, abs=1e-6)
    # Theil T and L are non-negative by Jensen's inequality
    assert row["theil_t"] >= 0 and row["theil_l"] >= 0


def test_anova_matches_numpy(spark, sf_dir):
    rows = QUERIES["orders_weekday_anova"](spark, sf_dir).collect()
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    dow = pd.to_datetime(o["o_orderdate"]).dt.isocalendar().day
    groups = [g.to_numpy() for _, g in o["o_totalprice"].groupby(dow)]
    k = len(groups)
    nn = sum(len(g) for g in groups)
    grand = np.concatenate(groups).mean()
    ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    f = (ssb / (k - 1)) / (ssw / (nn - k))
    assert rows[0]["f_stat"] == pytest.approx(f, rel=1e-5)
    assert all(r["f_stat"] == rows[0]["f_stat"] for r in rows)


def test_bh_fdr_step_up_property(spark, sf_dir):
    rows = QUERIES["ab_test_bh_fdr"](spark, sf_dir).collect()
    # discoveries must be a prefix of the p-rank order (step-up rule)
    flags = [r["discovery"] for r in sorted(rows, key=lambda r: r["p_rank"])]
    assert flags == sorted(flags, reverse=True)
    # every discovery's p is <= the LARGEST passing threshold, even if
    # above its own (the step-up subtlety)
    passing = [
        r["p_rank"] for r in rows if r["p_value"] <= r["bh_threshold"]
    ]
    k_star = max(passing) if passing else 0
    for r in rows:
        assert r["discovery"] == (r["p_rank"] <= k_star)


def test_jl_distortion_envelope(spark, sf_dir):
    rows = QUERIES["embedding_jl_distortion"](spark, sf_dir).collect()
    assert len(rows) == 190  # 20 probes -> C(20,2) pairs
    r0 = rows[0]
    # sign projections are unbiased: the mean ratio concentrates near 1
    assert 0.5 < r0["mean_ratio"] < 1.5
    assert r0["min_ratio"] > 0
    assert r0["min_ratio"] <= r0["mean_ratio"] <= r0["max_ratio"]
    ratios = [r["ratio"] for r in rows]
    assert max(ratios) == pytest.approx(r0["max_ratio"], abs=1e-6)


def test_lorenz_curve_properties(spark, sf_dir):
    rows = QUERIES["customer_lorenz_curve"](spark, sf_dir).collect()
    shares = [r["cum_revenue_share"] for r in rows]
    pops = [r["pop_share"] for r in rows]
    # monotone, below the diagonal (ascending sort), ends at 1
    assert shares == sorted(shares)
    assert all(s <= p + 1e-9 for s, p in zip(shares, pops))
    assert shares[-1] == pytest.approx(1.0, abs=1e-6)
    assert sum(r["n_customers"] for r in rows) > 0


def test_gumbel_moments_match_numpy(spark, sf_dir):
    row = QUERIES["monthly_revenue_gumbel"](spark, sf_dir).collect()[0]
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    daily = o.groupby(o["o_orderdate"].astype("datetime64[ns]").dt.date)[
        "o_totalprice"
    ].sum()
    mx = daily.groupby(
        pd.to_datetime(daily.index.astype(str)).to_period("M")
    ).max()
    beta = mx.std(ddof=0) * math.sqrt(6) / math.pi
    mu = mx.mean() - 0.5772156649015329 * beta
    assert row["n_months"] == len(mx)
    assert row["beta"] == pytest.approx(beta, rel=1e-6)
    assert row["mu"] == pytest.approx(mu, rel=1e-6)
    # return level exceeds the location parameter for T > e/(e-1)
    assert row["return_level_12m"] > row["mu"]


def test_hurst_in_valid_range(spark, sf_dir):
    rows = QUERIES["daily_revenue_hurst"](spark, sf_dir).collect()
    h = rows[0]["hurst"]
    assert all(r["hurst"] == h for r in rows)
    assert 0.0 < h < 1.0  # R/S slope of a real series
    # block counts halve (or better) as size doubles
    sizes = [r["block_size"] for r in rows]
    assert sizes == sorted(sizes)


def test_decision_stump_gain_positive(spark, sf_dir):
    row = QUERIES["order_value_decision_stump"](spark, sf_dir).collect()[0]
    assert row["gain"] >= 0
    assert 0 <= row["pos_rate_left"] <= 1
    assert 0 <= row["pos_rate_right"] <= 1
    assert row["gini_split"] <= row["gini_parent"] + 1e-9


def test_jackknife_pseudovalues_average_to_estimate(spark, sf_dir):
    rows = QUERIES["nation_jackknife_mean"](spark, sf_dir).collect()
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    mean_full = o["o_totalprice"].mean()
    # pseudo-value mean reproduces the full estimate iff groups are
    # equal-sized; for unequal groups it stays within the group spread
    pseudo = np.array([r["pseudovalue"] for r in rows])
    loo = np.array([r["loo_mean"] for r in rows])
    assert loo.min() <= mean_full <= loo.max() or np.allclose(
        loo, mean_full
    )
    assert rows[0]["jk_se"] > 0
    assert pseudo.std() > 0


def test_spearman_random_heavy_ties_matches_pandas(spark, tmp_path):
    """The r13 per-axis rank shape under adversarial tie structure:
    x drawn from only 4 distinct values, y quantized so duplicates
    land ON range-bucket boundaries (value % 1000 == 0 for some rows)
    — midranks must still match pandas' average-rank correlation."""
    import random

    import pandas as pd

    rng = random.Random(11)
    rows = []
    for i in range(5000):
        x = float(rng.choice([1, 2, 3, 50]))
        # cluster y on exact multiples of the 1000.0 bucket width for
        # ~20% of rows so tie groups sit exactly on bucket boundaries
        y = (
            float(rng.randrange(1, 8) * 1000)
            if rng.random() < 0.2
            else round(rng.uniform(900.0, 8000.0), 2)
        )
        rows.append((i, x, y, 1.0))
    pdf = pd.DataFrame(rows, columns=["k", "x", "y", "pad"])
    # write the minimal lineitem shape the query reads
    spark.createDataFrame(
        pdf.rename(
            columns={"x": "l_quantity", "y": "l_extendedprice"}
        )[["l_quantity", "l_extendedprice"]]
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    from technical_test_data_engineer_spark.plans.relational_breadth_queries import (  # noqa: E501
        lineitem_spearman_corr,
    )

    out = lineitem_spearman_corr(spark, str(tmp_path)).collect()[0]
    rx, ry = pdf["x"].rank(method="average"), pdf["y"].rank(method="average")
    assert out["n_rows"] == len(pdf)
    assert abs(out["spearman"] - rx.corr(ry)) < 1e-6
    assert abs(out["pearson"] - pdf["x"].corr(pdf["y"])) < 1e-6

"""Round-14 operator tests: the open-register HLL companion."""

from __future__ import annotations

import math

from technical_test_data_engineer_spark.plans.star_queries import QUERIES


def test_hll_md5_estimate_tracks_exact_count(spark, sf_dir):
    """The open HLL registers must estimate the true cardinality within
    the sketch's expected error envelope (1.04/sqrt(m) ~ 6.5% at
    m = 256; allow 4 sigma for one fixed fixture), the small-range
    correction must engage in the linear-counting regime, and every
    output row must agree on the broadcast summary columns."""
    rows = QUERIES["user_hll_md5_estimate"](spark, sf_dir).collect()
    assert rows, "no occupied buckets"
    n_exact = rows[0]["n_exact"]
    est = rows[0]["estimate"]
    v_zero = rows[0]["v_zero"]
    assert all(
        (r["n_exact"], r["v_zero"], r["estimate"]) == (n_exact, v_zero, est)
        for r in rows
    )
    assert len(rows) + v_zero == 256
    assert abs(est - n_exact) / n_exact <= 4 * 1.04 / math.sqrt(256)
    # registers are 1..53 by construction
    assert all(1 <= r["register"] <= 53 for r in rows)
    # linear-counting regime on these fixtures (n_exact << 2.5 m)
    if n_exact <= 640 and v_zero > 0:
        assert abs(est - 256.0 * math.log(256.0 / v_zero)) < 1e-6

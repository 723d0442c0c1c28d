"""Round-8 operator tests: independent-reference parity for the staged
funnel fold, the A-ES weighted sampler, and the t-closeness audit —
complements the oracle gate with adversarial random cases (equal
timestamps, deadline boundaries) and hand-checkable plants.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

_TYPES = ["signup", "view", "click", "purchase"]
_BASE = dt.datetime(2024, 1, 1)

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),      # user
        st.integers(min_value=0, max_value=3000),   # minutes (ties likely,
                                                    # 3000 min spans the 24 h
                                                    # = 1440 min deadline)
        st.integers(min_value=1, max_value=4),      # step code
    ),
    min_size=1,
    max_size=40,
)


def _funnel_reference(rows):
    """Staged strictly-after + 24 h-deadline walk over (ts, tcode)-sorted
    events — the chained-MIN semantics, implemented independently."""
    per_user: dict[int, list] = {}
    for u, minutes, tc in rows:
        per_user.setdefault(u, []).append((_BASE + dt.timedelta(minutes=minutes), tc))
    counts = [0, 0, 0, 0]
    limit = dt.timedelta(hours=24)
    for seq in per_user.values():
        t = [None, None, None, None]
        for ts, tc in sorted(seq):
            if tc == 1 and t[0] is None:
                t[0] = ts
            elif (
                2 <= tc <= 4
                and t[tc - 1] is None
                and t[tc - 2] is not None
                and t[tc - 2] < ts <= t[tc - 2] + limit
            ):
                t[tc - 1] = ts
        for k in range(4):
            if t[k] is not None:
                counts[k] += 1
    return counts


_case = [0]


@given(rows=events_strategy)
@settings(**SETTINGS)
def test_funnel_fold_matches_python_reference(spark, tmp_path, rows):
    from technical_test_data_engineer_spark.plans.window_queries import (
        user_funnel_staged_24h,
    )

    _case[0] += 1
    d = tmp_path / f"case{_case[0]}"
    d.mkdir()
    pd.DataFrame(
        [
            (i, u, _BASE + dt.timedelta(minutes=m), _TYPES[tc - 1], 1.0)
            for i, (u, m, tc) in enumerate(rows)
        ],
        columns=["event_id", "user_id", "ts", "event_type", "value"],
    ).to_parquet(d / "events.parquet", index=False)
    got = {
        r.step: r.n_users
        for r in user_funnel_staged_24h(spark, str(d)).collect()
    }
    want = _funnel_reference(rows)
    assert [got[s] for s in (1, 2, 3, 4)] == want, (rows, got, want)


def test_es_sample_matches_hashlib_reference(spark, sf_dir):
    import duckdb

    from technical_test_data_engineer_spark.plans.relational_breadth_queries import (
        order_es_weighted_sample,
    )

    orders = duckdb.sql(
        f"SELECT o_orderkey, o_totalprice FROM '{sf_dir}/orders.parquet'"
    ).fetchall()
    keyed = []
    for okey, w in orders:
        h = int(hashlib.md5(str(okey).encode()).hexdigest()[:15], 16)
        u = (h + 0.5) / float(1 << 60)
        keyed.append((round(math.log(u) / w, 12), okey))
    # mirror the query's ordering exactly (r08 advice): key rounded to
    # 12 digits, DESC on the key, ASC o_orderkey tiebreak — so an exact
    # tie or a rounding collision at the 50th cut cannot flake the test
    want = {
        okey
        for _, okey in sorted(keyed, key=lambda t: (-t[0], t[1]))[:50]
    }
    got = {r.o_orderkey for r in order_es_weighted_sample(spark, sf_dir).collect()}
    assert got == want


def test_t_closeness_hand_computed(spark, tmp_path):
    from technical_test_data_engineer_spark.plans.privacy_queries import (
        nation_t_closeness,
    )

    # group (1, 0): 4xBUILDING; group (2, 0): 3xAUTO + 1xBUILDING
    # global: 3 AUTO, 5 BUILDING -> p = (0.375, 0.625)
    rows = (
        [(1, 0.0, "BUILDING")] * 4
        + [(2, 0.0, "AUTO")] * 3
        + [(2, 0.0, "BUILDING")]
    )
    pd.DataFrame(
        rows, columns=["c_nationkey", "c_acctbal", "c_mktsegment"]
    ).to_parquet(tmp_path / "customer.parquet", index=False)
    out = {
        (r.c_nationkey, r.acct_band): r
        for r in nation_t_closeness(spark, str(tmp_path)).collect()
    }
    # hand TVD: g1 = (0, 1) vs (0.375, 0.625) -> 0.5*(0.375+0.375) = 0.375
    #           g2 = (0.75, 0.25) -> 0.5*(0.375+0.375) = 0.375
    for key in ((1, 0), (2, 0)):
        r = out[key]
        assert abs(r.tvd - 0.375) < 1e-9, r
        assert r.t_close is False  # 0.375 > t = 0.2
    assert out[(1, 0)].group_size == 4 and out[(2, 0)].group_size == 4

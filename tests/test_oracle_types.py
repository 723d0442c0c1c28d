"""Static type-sweep of every oracle SQL string (r5 verdict item 3).

Round-5's only red driver row (``q12_ship_class_priority``) was an
oracle TYPE bug, not a Spark bug: DuckDB types a bare ``SUM(int)`` /
``SUM(CASE ... 1 ... 0 ...)`` as HUGEINT, and the driver's pandas
canonicalizer coerces HUGEINT to float64 — while the Spark plan returns
bigint → int64, so the type-strict value hash differs on every row.

This test closes the class permanently without executing anything: it
``DESCRIBE``\\ s each registered oracle against the sf0.001 views and
asserts no result column is typed HUGEINT/UHUGEINT.  The fix convention
is ``CAST(SUM(...) AS BIGINT)`` in the oracle string (the Spark side is
already bigint and needs no change) — see
``plans/dedup_queries.py`` and ``plans/tpch_extra_queries.py`` (q12).

DOUBLE-typed oracle columns are fine: pandas keeps them float64 and the
Spark twin is float64 too (the engine's convention is to cast ratio /
score columns to double on BOTH sides).  Only the silent
integer→float64 coercion of HUGEINT diverges from Spark.
"""

from __future__ import annotations

import os

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

BAD_TYPES = {"HUGEINT", "UHUGEINT", "INT128", "UINT128"}


@pytest.fixture(scope="module")
def oracle_map():
    import __spark_entry__ as e

    return e.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def test_no_hugeint_columns_in_any_oracle(con, oracle_map):
    """Every oracle column must survive the driver's pandas path with
    its integer-ness intact: HUGEINT → float64 is a silent hash-killer.
    """
    offenders = []
    for name, sql in oracle_map.items():
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as ex:  # noqa: BLE001 — surface as a failure
            offenders.append((name, f"<DESCRIBE failed: {ex}>"))
            continue
        for col, typ, *_ in desc:
            if str(typ).upper().split("(")[0] in BAD_TYPES:
                offenders.append((name, f"{col}: {typ}"))
    assert not offenders, (
        "Oracle columns that pandas will coerce to float64 while Spark "
        "returns bigint (wrap in CAST(... AS BIGINT)): "
        + "; ".join(f"{n} [{c}]" for n, c in offenders)
    )

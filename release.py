"""Round-close release step (r6 verdict item 3) — makes the evidence
commit MECHANICAL so the round record can never drift again:

1. refuses to run if another Spark session is alive (a concurrent run
   measured 2-3x inflated totals — BENCH gotcha list);
2. runs the canonical solo ``bench.py`` over the FINAL registry
   (writes ``BENCH_FULL.json``);
3. asserts ``len(BENCH_FULL.queries) == len(registry)`` — the r04-r06
   rounds each closed with three different registry counts in the
   record because the bench ran before the last queries landed;
4. appends the round note to ``BASELINE.md`` (count + total, so the
   note can never disagree with the JSON it describes);
5. commits BENCH_FULL.json + BASELINE.md (+ anything staged) as ONE
   unit, leaving ``git status`` clean.

Usage:  python release.py <round> ["extra note sentence..."]
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent


def main() -> None:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "?"
    note = sys.argv[2] if len(sys.argv) > 2 else ""

    out = subprocess.run(
        ["pgrep", "-f", "pyspark.daemon|SparkSubmit"],
        capture_output=True, text=True,
    )
    if out.stdout.strip():
        sys.exit(
            "another Spark session is alive (pids: "
            f"{out.stdout.split()}) — bench totals would be inflated; "
            "stop it and rerun"
        )

    subprocess.run([sys.executable, str(REPO / "bench.py")], check=True)

    sys.path.insert(0, str(REPO))
    import __spark_entry__ as entry

    registry = list(entry.queries())
    bench = json.loads((REPO / "BENCH_FULL.json").read_text())
    timed = list(bench["queries"])
    missing = sorted(set(registry) - set(timed))
    extra = sorted(set(timed) - set(registry))
    if missing or extra:
        sys.exit(f"BENCH_FULL/registry mismatch: missing={missing} extra={extra}")

    # Unique heading per record (r08 advice: five identical round-8
    # headings made cross-references ambiguous) — number re-releases
    # within a round.
    seq = (REPO / "BASELINE.md").read_text().count(
        f"## Round-{rnd} release record"
    ) + 1
    line = (
        f"\n## Round-{rnd} release record {seq} (release.py)\n\n"
        f"Canonical round-closing solo bench over the FINAL registry: "
        f"**{bench['value']} s / {len(timed)} queries** at sf={bench['sf']} "
        f"(count asserted equal to the registry by release.py, so the "
        f"note cannot disagree with BENCH_FULL.json). {note}\n"
    )
    with open(REPO / "BASELINE.md", "a", encoding="utf-8") as f:
        f.write(line)

    subprocess.run(["git", "add", "-A"], cwd=REPO, check=True)
    subprocess.run(
        ["git", "commit", "-m",
         f"round {rnd}: canonical bench over final registry "
         f"({len(timed)} queries, {bench['value']} s)"],
        cwd=REPO, check=True,
    )
    print(f"released: {len(timed)} queries, {bench['value']} s")


if __name__ == "__main__":
    main()

"""Mechanical bench regression check: compare two BENCH_r{N}.json files
per query and flag slowdowns beyond a noise threshold.

The driver records one BENCH file per round; BASELINE.md's
round-over-round table is the narrative, this is the machine check.
Bench wall-clock varies ±50% locally (see .claude/skills/verify), so
the default threshold is 2× AND ≥0.5s absolute — below that it's noise.

Usage: python bench_diff.py BENCH_r01.json BENCH_r02.json [threshold]
Exit code 1 iff any query regressed beyond threshold.
"""

from __future__ import annotations

import json
import sys


def _queries(path: str) -> dict[str, float]:
    with open(path, encoding="utf-8") as fh:
        raw = fh.read()
    # driver bench files wrap the JSON line in {"tail": "..."} when the
    # output was truncated; handle both shapes
    try:
        doc = json.loads(raw)
    except json.JSONDecodeError:
        doc = json.loads([l for l in raw.splitlines() if l.startswith("{")][-1])
    if "queries" in doc:
        return doc["queries"]
    if "parsed" in doc and isinstance(doc["parsed"], dict):
        return doc["parsed"].get("queries", {})
    if "tail" in doc:
        # driver BENCH files may hold only a truncated stdout tail —
        # recover whatever "name": seconds pairs survive, dropping the
        # first (possibly cut mid-number) and the trailing sf field
        import re

        pairs = re.findall(r'"([a-z0-9_]+)":\s*([0-9.]+)', doc["tail"])
        out = {k: float(v) for k, v in pairs if k not in ("sf", "value", "n", "rc", "cpus")}
        if out:
            return out
    raise SystemExit(f"no per-query timings found in {path}")


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old, new = _queries(sys.argv[1]), _queries(sys.argv[2])
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    regressed = []
    for name, t_new in sorted(new.items()):
        t_old = old.get(name)
        if t_old is None:
            print(f"NEW    {name}: {t_new:.2f}s")
            continue
        if t_new > t_old * factor and t_new - t_old >= 0.5:
            regressed.append((name, t_old, t_new))
    for name in sorted(set(old) - set(new)):
        print(f"GONE   {name} (was {old[name]:.2f}s)")
    for name, t_old, t_new in sorted(regressed, key=lambda x: x[1] - x[2]):
        print(f"SLOWER {name}: {t_old:.2f}s -> {t_new:.2f}s")
    total_old = sum(old.get(n, 0) for n in new if n in old)
    total_new = sum(t for n, t in new.items() if n in old)
    print(
        f"\nshared-query totals: {total_old:.1f}s -> {total_new:.1f}s; "
        f"{len(regressed)} regression(s) beyond {factor}x"
    )
    return 1 if regressed else 0


if __name__ == "__main__":
    sys.exit(main())

"""Atomic multi-table publish (SURVEY.md §3 E1).

The reference replaces its two tables with back-to-back
``to_sql(if_exists='replace')`` calls
(/root/reference/tasks/scraper/src/scraper.py:23-24) — a crash between
the two writes leaves new ``zones`` next to stale ``arretes``, and
every join downstream silently mixes snapshots. Spark's
``mode("overwrite")`` has the same window when called per table.

This module closes it with a versioned stage-then-flip pattern:

1. every publish writes ALL tables under a fresh ``_v{n}`` directory;
2. only after every write succeeds, a one-line ``_CURRENT`` pointer
   file is replaced via ``os.replace`` — atomic on POSIX;
3. readers resolve ``_CURRENT`` first, so they only ever see a version
   whose every table finished writing. A crash mid-publish leaves a
   garbage ``_v{n}`` directory (harmless, GC-able) and the pointer
   still on the previous complete snapshot.

The same shape works on object stores by swapping the pointer-file
rename for a conditional PUT, and is exactly what table formats
(Delta/Iceberg) generalize with multi-table transactions.
"""

from __future__ import annotations

import os
import re
import tempfile

from pyspark.sql import DataFrame, SparkSession

_POINTER = "_CURRENT"
_VERSION_RE = re.compile(r"^_v(\d+)$")


def _versions(root: str) -> list[int]:
    if not os.path.isdir(root):
        return []
    out = []
    for name in os.listdir(root):
        m = _VERSION_RE.match(name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def current_version(root: str) -> int | None:
    """The committed snapshot version, or None before the first
    successful publish. Only reads the pointer — never guesses from
    directory listings (a half-written ``_v{n}`` must stay invisible)."""
    ptr = os.path.join(root, _POINTER)
    if not os.path.exists(ptr):
        return None
    with open(ptr, encoding="utf-8") as fh:
        return int(fh.read().strip())


def publish_tables(root: str, tables: dict[str, DataFrame]) -> int:
    """Write every DataFrame in ``tables`` as parquet under one new
    version directory, then atomically flip the ``_CURRENT`` pointer.
    Returns the committed version number. If any write raises, the
    pointer is untouched and readers keep the previous snapshot."""
    os.makedirs(root, exist_ok=True)
    version = (_versions(root)[-1] + 1) if _versions(root) else 1
    vdir = os.path.join(root, f"_v{version}")
    for name, df in tables.items():
        df.write.mode("errorifexists").parquet(os.path.join(vdir, name))
    # commit point: write-then-rename so the pointer file is never
    # observable half-written
    fd, tmp = tempfile.mkstemp(dir=root, prefix="._ptr")
    try:
        with os.fdopen(fd, "w", encoding="utf-8") as fh:
            fh.write(str(version))
        os.replace(tmp, os.path.join(root, _POINTER))
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    return version


def read_published(spark: SparkSession, root: str, name: str) -> DataFrame:
    """Read table ``name`` from the committed snapshot."""
    version = current_version(root)
    if version is None:
        raise FileNotFoundError(f"no committed snapshot under {root}")
    return spark.read.parquet(os.path.join(root, f"_v{version}", name))

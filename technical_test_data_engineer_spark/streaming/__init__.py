"""Structured Streaming layer (SURVEY.md §2.10 / §7 Phase 4).

The reference's only "streaming" capability is a manual batch refresh
(button → re-scrape → full-replace,
/root/reference/tasks/visualization/src/visualization.py:226-233,
/root/reference/tasks/scraper/src/scraper.py:23-24). This package is the
idiomatic-Spark upgrade: file-source streams over the ``events`` table,
event-time windows + watermarks for late data, a custom stateful
operator, and a ``foreachBatch`` overwrite sink that reproduces the
reference's full-replace semantics exactly.

Design rule: every transformation is DataFrame-in → DataFrame-out and
works unchanged on a batch frame or a streaming frame — batch runs are
oracle-checked (DuckDB), the streaming tests assert stream == batch.
"""

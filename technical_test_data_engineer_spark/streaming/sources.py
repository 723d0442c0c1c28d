"""Streaming sources.

File-based streams (parquet/CSV/JSON directories) are the engine's
bridge from the reference's "re-download the whole CSV on refresh"
model (/root/reference/tasks/scraper/src/scraper.py:13-17) to
incremental processing: drop new files in the directory and only the
new files are read. Streaming scans REQUIRE a declared schema — there
is no inferSchema on an unbounded source, which is also our §7 Phase 5
rule for batch at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from technical_test_data_engineer_spark.streaming.transforms import with_event_time

def _events_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


# Engine-written event files carry a real timestamp column.
EVENTS_STREAM_SCHEMA = _events_schema(T.TimestampType())
# The driver's raw events.parquet stores ts as TIMESTAMP(NANOS); under
# spark.sql.legacy.parquet.nanosAsLong it surfaces as bigint nanos,
# converted to a proper timestamp by with_event_time.
EVENTS_STREAM_SCHEMA_NANOS = _events_schema(T.LongType())


def read_events_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
    nanos_ts: bool = False,
) -> DataFrame:
    """Open ``path`` (a directory of parquet files, or a glob) as an
    unbounded stream of events with a normalized timestamp column.

    ``max_files_per_trigger`` caps each micro-batch — the backpressure
    knob when catching up on a large backlog. Set ``nanos_ts`` when
    streaming the driver's raw nanos-timestamped files.
    """
    schema = EVENTS_STREAM_SCHEMA_NANOS if nanos_ts else EVENTS_STREAM_SCHEMA
    if nanos_ts:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return with_event_time(reader.parquet(path))

"""Streaming operators over the `events` table.

Batch/stream parity by construction: every transformation here takes
a DataFrame (batch or streaming — the unified API) and is exercised
both ways in tests; `run_available_now` drains a file-stream source
through a query into an in-memory sink, which is also how an
incremental production run would execute (AvailableNow = process all
new files since the last checkpoint, then stop).

Schema note: the testdata's events.parquet has shipped ``ts`` as both
TIMESTAMP(NANOS) and plain ``timestamp[us]`` (TIMESTAMP_NTZ) across
generations; `read_event_stream` probes which generation a directory
holds and picks the matching stream schema (long nanos under the
``nanosAsLong`` legacy conf, or TIMESTAMP_NTZ), and `with_event_time`
branches on the dtype it actually sees — the same normalization as
the batch-side ``events_tbl`` — so every operator consumes one
TimestampType ``event_time`` column.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

from namegraph_collections_spark.queries.registry import ts_us_expr

def _events_schema(ts_field: StructField) -> StructType:
    return StructType(
        [
            StructField("event_id", LongType()),
            ts_field,
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )


#: Schema for the timestamp[us] (TIMESTAMP_NTZ) events generation.
EVENTS_SCHEMA = _events_schema(StructField("ts", TimestampNTZType()))
#: Schema for the TIMESTAMP(NANOS) generation, which Spark can only
#: read as long nanos under spark.sql.legacy.parquet.nanosAsLong.
EVENTS_SCHEMA_NANOS = _events_schema(StructField("ts", LongType()))

_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def read_event_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    """File-stream source over a directory of events parquet files.

    One file = one micro-batch unit; at scale this is the landing-zone
    pattern (upstream drops files, the stream discovers them).

    The testdata's ``ts`` has shipped as both TIMESTAMP(NANOS) and
    timestamp[us] across generations, so the physical encoding is
    probed with a batch schema read under ``nanosAsLong`` (the only
    mode in which the NANOS generation resolves at all): ``bigint`` ⇒
    nanos files — keep the conf set (the stream needs it at execution
    time) and type ``ts`` as LongType; anything else ⇒ restore the
    conf and use the TIMESTAMP_NTZ schema. Either way
    ``with_event_time`` sees the dtype it branches on.
    """
    prev = spark.conf.get(_NANOS_CONF, None)
    spark.conf.set(_NANOS_CONF, "true")
    try:
        ts_dtype = dict(spark.read.parquet(events_dir).dtypes).get("ts")
    except Exception:  # empty/unreadable dir — assume current generation
        ts_dtype = None
    if ts_dtype != "bigint":
        if prev is None:
            spark.conf.unset(_NANOS_CONF)
        else:
            spark.conf.set(_NANOS_CONF, prev)
    schema = EVENTS_SCHEMA_NANOS if ts_dtype == "bigint" else EVENTS_SCHEMA
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )


def with_event_time(events: DataFrame) -> DataFrame:
    """Derive the TimestampType event-time column watermarks need,
    timezone-independently, from whichever physical ``ts`` encoding the
    source produced (long nanos / TIMESTAMP_NTZ micros / TIMESTAMP)."""
    dtype = dict(events.dtypes)["ts"]
    return events.withColumn("event_time", F.timestamp_micros(ts_us_expr(dtype)))


def windowed_rollup(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window rollup per event_type.

    The streaming twin of the batch `hourly_event_rollup` query: counts
    and value sums per (window, event_type), with late data beyond the
    watermark dropped. Works identically on a batch DataFrame (the
    watermark is a no-op there), which is how tests pin parity.
    """
    e = with_event_time(events).withWatermark("event_time", watermark)
    return (
        e.groupBy(F.window("event_time", window), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .select(
            F.unix_micros(F.col("window.start")).alias("hour_us"),
            "event_type",
            "n",
            "total_value",
        )
    )


def streaming_dedup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exactly-once event stream: drop duplicate event_ids arriving
    within the watermark horizon (state is bounded by the watermark —
    the streaming analogue of the exact-dedup hash groupBy)."""
    e = with_event_time(events).withWatermark("event_time", watermark)
    return e.dropDuplicatesWithinWatermark(["event_id"])


def sessionize(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Session windows per user (gap-based). Streaming-native via
    `session_window`; the batch twin (`session_window_rollup` query)
    is oracle-checked against a gaps-and-islands SQL formulation."""
    e = with_event_time(events).withWatermark("event_time", watermark)
    return (
        e.groupBy(F.session_window("event_time", gap), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("session_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
            F.unix_micros(F.col("session_window.end")).alias("session_end_us"),
            "n_events",
            "session_value",
        )
    )


RUNNING_TOTALS_OUTPUT = "user_id long, total double, n long"
RUNNING_TOTALS_STATE = "total double, n long"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator: per-user running value
    totals via ``applyInPandasWithState`` (the applyInPandasWithState
    pattern for operators Spark lacks natively — SURVEY §2.11).

    State is one (total, n) pair per user, updated per micro-batch
    from Arrow batches; each batch emits the user's new running
    totals. This is the template for any accumulator-style operator
    (fraud counters, quota tracking, per-key model state).
    """
    import pandas as pd  # noqa: PLC0415 — worker-side import
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdf_iter, state: GroupState):
        total, n = state.get if state.exists else (0.0, 0)
        for pdf in pdf_iter:
            total += float(pdf["value"].sum())
            n += len(pdf)
        state.update((total, n))
        yield pd.DataFrame({"user_id": [key[0]], "total": [total], "n": [n]})

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        RUNNING_TOTALS_OUTPUT,
        RUNNING_TOTALS_STATE,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def run_available_now(stream_df: DataFrame, checkpoint_dir: str, output_mode: str = "append") -> DataFrame:
    """Drain a streaming DataFrame with Trigger.AvailableNow into a
    memory sink and return the result as a batch DataFrame.

    AvailableNow processes everything currently available (respecting
    maxFilesPerTrigger batching) and stops — the incremental-batch
    execution mode; with a persistent checkpoint_dir, a re-run
    processes only files that arrived since.
    """
    name = f"mem_{uuid.uuid4().hex[:12]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)

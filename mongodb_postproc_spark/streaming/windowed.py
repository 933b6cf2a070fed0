"""Structured Streaming operators.

The reference is pure batch (SURVEY.md §2.9); the crawl is deliberately
round-based batch for exact-order reproduction. These streaming operators
cover the *continuous-ingest* shape a production frontier would use — new
URL discoveries / fetched-event streams aggregated with watermarks — and the
`events` testdata table drives them in tests via a file source + memory sink.

At scale: watermark bounds state; the per-host politeness shape maps to
``session_window`` / keyed state exactly like the batch window in
engine.run_round maps to rank × delay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(spark: SparkSession, path_glob: str) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path_glob)
    )


def windowed_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window counts with late-data watermark (the metrics-table
    stream: per-round fetched/new counters as a continuous query)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("win.start").alias("win_start"), "event_type", "n", "total_value")
    )


def sessionized(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Session windows per user (gap-based) — the per-host politeness/session
    shape in streaming form."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("sess.start").alias("sess_start"),
            F.col("sess.end").alias("sess_end"),
            "user_id",
            "n_events",
        )
    )


def run_to_memory(stream_df: DataFrame, name: str) -> None:
    """Drive a streaming query to completion over a finite file source
    (test/smoke harness: processAllAvailable + stop)."""
    q = (
        stream_df.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()

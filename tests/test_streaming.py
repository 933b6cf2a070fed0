"""Structured Streaming smoke: file source → watermark agg → memory sink,
cross-checked against the equivalent batch aggregation."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from mongodb_postproc_spark.streaming.windowed import (
    read_event_stream,
    run_to_memory,
    sessionized,
    windowed_counts,
)


@pytest.fixture(scope="module")
def events_dir(sf_dir, tmp_path_factory):
    """File stream source requires a directory; stage the events parquet."""
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{sf_dir}/events.parquet", os.path.join(d, "part-0.parquet"))
    return str(d)


def test_windowed_counts_match_batch(spark, sf_dir, events_dir):
    path = f"{sf_dir}/events.parquet"
    stream = read_event_stream(spark, events_dir)
    run_to_memory(windowed_counts(stream), "win_counts")
    got = {
        (r["win_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    batch = (
        spark.read.parquet(path)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("win.start").alias("win_start"), "event_type", "n", "total_value")
    )
    want = {
        (r["win_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in batch.collect()
    }
    # Append mode withholds windows still inside the watermark horizon when
    # the finite stream ends; everything emitted must match batch exactly,
    # and only horizon-tail windows may be withheld.
    import datetime

    max_ts = spark.read.parquet(path).agg(F.max("ts")).collect()[0][0]
    horizon = max_ts - datetime.timedelta(hours=3)  # watermark + window slack
    assert len(got) > 0
    for k, v in got.items():
        assert want[k] == v, k
    withheld = set(want) - set(got)
    assert all(ws >= horizon for ws, _ in withheld), withheld


def test_sessionization_runs(spark, events_dir):
    stream = read_event_stream(spark, events_dir)
    run_to_memory(sessionized(stream), "sessions")
    rows = spark.sql("SELECT * FROM sessions").collect()
    assert all(r["n_events"] >= 1 for r in rows)

"""Stream-stream joins (Structured Streaming's symmetric stateful join).

The batch engine joins discoveries to fetches inside one round; a
continuous deployment instead sees two unbounded streams and must join them
with BOUNDED state. This module covers that capability class with the
canonical attribution shape over the `events` stream: each `purchase` is
joined to the same user's `view` events in the preceding hour.

Why this is the scale-safe form (Spark requires both for unbounded inputs):
- watermarks on BOTH sides bound how late either stream may arrive, and
- the time-interval predicate (view_ts within [purchase_ts - horizon,
  purchase_ts]) bounds how long a row can still find new partners,
so each side's state store holds only `watermark + horizon` of data per
key — eviction is continuous, state never grows with stream length. The
join itself shuffles both streams on user_id (the equi-key); everything
else rides the state-store symmetric hash join.

tests/test_stream_join.py drives it file-per-micro-batch and asserts the
emitted result equals the equivalent batch join exactly, including across
a two-batch time split (cross-batch matches must surface from state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution_join(
    views: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Join each purchase to the same user's views in the trailing
    `horizon`, both streams watermarked so join state stays bounded."""
    v = views.withWatermark("ts", watermark).select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    cond = F.expr(
        f"v_user = p_user AND view_ts <= purchase_ts "
        f"AND view_ts >= purchase_ts - INTERVAL {horizon}"
    )
    return p.join(v, cond, "inner").select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "view_id",
        "purchase_ts",
        "view_ts",
        "purchase_value",
    )


def split_event_streams(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Route one event stream into the two join inputs (view / purchase) —
    a filter per side, no shuffle added before the join's own exchange."""
    return (
        events.filter(F.col("event_type") == "view"),
        events.filter(F.col("event_type") == "purchase"),
    )

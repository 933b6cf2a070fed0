"""Time-series operators over the events table: gap sessionization and
as-of lookup — the two classic temporal shapes Spark has no single
built-in for, expressed as compositions of windows (SURVEY.md §2 custom-
operator guidance: composition of existing DataFrame ops first).

Cross-engine determinism: all arithmetic runs on integer epoch seconds
(bigint) and ties order by event_id, so the oracle hash can never drift
on timestamp formatting or last-ulp doubles. At corpus scale both
operators are one hash exchange on the entity key (user_id) followed by
in-partition ordered scans — the same shape at 10^10 events, no global
sort, no join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .base import load, register

_GAP_S = 1800  # classic 30-minute inactivity gap


def _epoch(dialect: str) -> str:
    # integer seconds on both engines (Spark unix_timestamp truncates;
    # DuckDB epoch() returns fractional seconds -> floor)
    return (
        "unix_timestamp(ts)" if dialect == "spark"
        else "CAST(floor(epoch(ts)) AS BIGINT)"
    )


def _sessionize_sql(dialect: str, src: str = "events") -> str:
    es = _epoch(dialect)
    return f"""
      WITH stamped AS (
        SELECT event_id, user_id, {es} AS ts_s FROM {src}),
      flagged AS (
        SELECT event_id, user_id, ts_s,
               CASE WHEN ts_s - lag(ts_s) OVER w > {_GAP_S}
                    OR lag(ts_s) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
        FROM stamped
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)),
      numbered AS (
        -- the running sum MUST order by the same (ts_s, event_id) key as
        -- the lag window: same-second ties exist in the data, and without
        -- the tiebreak the session numbering of tied rows is
        -- engine/partition-order dependent
        SELECT user_id, ts_s,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_idx
        FROM flagged)
      SELECT user_id, session_idx,
             count(*) AS n_events,
             min(ts_s) AS start_s,
             max(ts_s) - min(ts_s) AS duration_s
      FROM numbered
      GROUP BY user_id, session_idx
    """


@register(
    "ts_sessionize",
    _sessionize_sql("duckdb"),
    f"Gap-based sessionization ({_GAP_S // 60}-minute inactivity gap): "
    "lag over (user, time) flags session starts, a running sum numbers "
    "them, one aggregate summarizes each session — the batch twin of the "
    "streaming session windows in streaming/windowed.py. Integer epoch "
    "seconds + event_id tiebreak keep both engines bit-identical. One "
    "hash exchange on user_id, in-partition ordered scan — the same plan "
    "at 10^10 events",
)
def ts_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    load(spark, sf, "events").createOrReplaceTempView("v_ts_events")
    return spark.sql(_sessionize_sql("spark", "v_ts_events"))


def _asof_sql(dialect: str, src: str = "events") -> str:
    es = _epoch(dialect)
    return f"""
      WITH stamped AS (
        SELECT event_id, user_id, event_type, {es} AS ts_s FROM {src}),
      marked AS (
        SELECT event_id, user_id, event_type, ts_s,
               max(CASE WHEN event_type = 'signup' THEN ts_s END)
                 OVER (PARTITION BY user_id ORDER BY ts_s, event_id
                       ROWS UNBOUNDED PRECEDING) AS last_signup_s
        FROM stamped)
      SELECT event_id, user_id, event_type,
             ts_s - last_signup_s AS since_signup_s
      FROM marked
      WHERE event_type <> 'signup'
    """


@register(
    "ts_asof_last_signup",
    _asof_sql("duckdb"),
    "As-of lookup: for every event, the time since that user's most "
    "recent signup at-or-before it (NULL if none yet) — the as-of-join "
    "semantics expressed as a conditional running max instead of a range "
    "join, so there is no join at all: one window over the entity key, "
    "O(n) per partition, immune to the row-explosion a naive "
    "time-inequality join suffers at scale",
)
def ts_asof_last_signup(spark: SparkSession, sf: str) -> DataFrame:
    load(spark, sf, "events").createOrReplaceTempView("v_asof_events")
    return spark.sql(_asof_sql("spark", "v_asof_events"))

"""Stream-stream interval join == the equivalent batch join, exactly.

Two drive shapes over the events table:
- single micro-batch (whole table in one file): every match is found inside
  one state-store pass;
- two micro-batches split strictly between a matched view and its purchase
  (straddle asserted ≥1 in the fixture): the straddling match must surface
  from the first batch's retained join state — the stateful part a batch
  join never exercises.
"""

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from mongodb_postproc_spark.streaming.joins import attribution_join, split_event_streams
from mongodb_postproc_spark.streaming.windowed import read_event_stream, run_to_memory


def _batch_expected(spark, path):
    ev = spark.read.parquet(path)
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    joined = p.join(
        v,
        F.expr(
            "v_user = p_user AND view_ts <= purchase_ts "
            "AND view_ts >= purchase_ts - INTERVAL 1 hour"
        ),
    )
    return {
        (r["purchase_id"], r["view_id"]): (r["purchase_value"],)
        for r in joined.collect()
    }


def _stream_result(spark, src_dir, name):
    stream = read_event_stream(spark, src_dir)
    views, purchases = split_event_streams(stream)
    run_to_memory(attribution_join(views, purchases), name)
    return {
        (r["purchase_id"], r["view_id"]): (r["purchase_value"],)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }


def _matched_pairs(df):
    """(view_ts, purchase_ts) of every view→purchase match, pandas-side."""
    views = df[df.event_type == "view"]
    purchases = df[df.event_type == "purchase"]
    out = []
    for _, p in purchases.iterrows():
        uv = views[views.user_id == p.user_id]
        hit = uv[(uv.ts <= p.ts) & (uv.ts >= p.ts - pd.Timedelta(hours=1))]
        out.extend((vts, p.ts) for vts in hit.ts)
    return out


@pytest.fixture(scope="module")
def split_dirs(sf_dir, tmp_path_factory):
    """one-file dir (single micro-batch) + two-file dir split INSIDE a
    matched pair's window, so at least one match must straddle the
    micro-batch boundary and can only come from retained join state."""
    t = pq.read_table(f"{sf_dir}/events.parquet")
    one = tmp_path_factory.mktemp("sj_one")
    pq.write_table(t, os.path.join(one, "part-0.parquet"))
    df = t.to_pandas().sort_values("ts").reset_index(drop=True)
    pairs = _matched_pairs(df)
    assert pairs, "fixture needs at least one view->purchase match"
    # widest-gap pair gives the safest strictly-between split point
    vts, pts = max(pairs, key=lambda x: x[1] - x[0])
    split_ts = vts + (pts - vts) / 2
    lo, hi = df[df.ts <= split_ts], df[df.ts > split_ts]
    n_straddle = sum(1 for v, p in pairs if v <= split_ts < p)
    assert n_straddle >= 1 and len(lo) and len(hi)
    two = tmp_path_factory.mktemp("sj_two")
    import pyarrow as pa

    pq.write_table(pa.Table.from_pandas(lo), os.path.join(two, "part-0.parquet"))
    pq.write_table(pa.Table.from_pandas(hi), os.path.join(two, "part-1.parquet"))
    # the file source orders micro-batches by mtime: pin part-0 strictly older
    os.utime(os.path.join(two, "part-0.parquet"), (1_600_000_000, 1_600_000_000))
    os.utime(os.path.join(two, "part-1.parquet"), (1_600_000_100, 1_600_000_100))
    return str(one), str(two)


def test_single_batch_equals_batch_join(spark, sf_dir, split_dirs):
    want = _batch_expected(spark, f"{sf_dir}/events.parquet")
    got = _stream_result(spark, split_dirs[0], "sj_single")
    assert len(want) > 0
    assert got == want


def test_cross_batch_state_matches(spark, sf_dir, split_dirs):
    want = _batch_expected(spark, f"{sf_dir}/events.parquet")
    got = _stream_result(spark, split_dirs[1], "sj_split")
    assert got == want

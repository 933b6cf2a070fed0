"""Streaming upsert sink: exactly-once effect into the snapshot catalog.

- multi-batch run lands every event exactly once (count == distinct keys),
- killing the query between files and resuming on the SAME checkpoint does
  not double-apply the already-committed batches,
- a correction batch (same keys, new values) updates in place,
- double-applying an identical batch (the crash-replay case) leaves the
  visible table unchanged — merge_upsert idempotence, asserted directly.
"""

from __future__ import annotations

import os
import shutil

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from mongodb_postproc_spark.streaming.sinks import upsert_stream
from mongodb_postproc_spark.streaming.windowed import read_event_stream
from mongodb_postproc_spark.tables import TableCatalog


@pytest.fixture()
def staged(sf_dir, tmp_path):
    """events parquet split into 3 time-ordered files, mtime-pinned."""
    import pyarrow as pa

    df = pq.read_table(f"{sf_dir}/events.parquet").to_pandas().sort_values("ts")
    d = tmp_path / "src"
    d.mkdir()
    n = len(df)
    for i, sl in enumerate((df.iloc[: n // 3], df.iloc[n // 3 : 2 * n // 3], df.iloc[2 * n // 3 :])):
        p = str(d / f"part-{i}.parquet")
        pq.write_table(pa.Table.from_pandas(sl.reset_index(drop=True)), p)
        os.utime(p, (1_600_000_000 + i * 100,) * 2)
    return str(d), n


def _run(spark, src, catalog, ckpt):
    q = upsert_stream(
        read_event_stream(spark, src), catalog, "t_events", "event_id", ckpt,
        query_name="sink_t",
    )
    q.awaitTermination()


def test_multibatch_lands_exactly_once(spark, staged, tmp_path):
    src, n = staged
    cat = TableCatalog(str(tmp_path / "wh"))
    _run(spark, src, cat, str(tmp_path / "ck"))
    out = cat.read("t_events", spark)
    assert out.count() == n
    assert out.select("event_id").distinct().count() == n


def test_resume_on_same_checkpoint_no_duplicates(spark, staged, tmp_path):
    src, n = staged
    # phase 1: only two files visible
    part = str(tmp_path / "partial")
    os.makedirs(part)
    for f in sorted(os.listdir(src))[:2]:
        shutil.copy2(os.path.join(src, f), os.path.join(part, f))
    cat = TableCatalog(str(tmp_path / "wh2"))
    ckpt = str(tmp_path / "ck2")
    _run(spark, part, cat, ckpt)
    mid = cat.read("t_events", spark).count()
    assert 0 < mid < n
    # phase 2: third file arrives; SAME checkpoint — committed batches must
    # not re-apply
    shutil.copy2(
        os.path.join(src, sorted(os.listdir(src))[2]),
        os.path.join(part, sorted(os.listdir(src))[2]),
    )
    _run(spark, part, cat, ckpt)
    out = cat.read("t_events", spark)
    assert out.count() == n
    assert out.select("event_id").distinct().count() == n


def test_correction_batch_updates_in_place(spark, staged, tmp_path):
    src, n = staged
    cat = TableCatalog(str(tmp_path / "wh3"))
    _run(spark, src, cat, str(tmp_path / "ck3"))
    # apply a correction: same 5 keys, bumped values (the upsert semantics)
    base = cat.read("t_events", spark).orderBy("event_id").limit(5)
    fix = base.withColumn("value", F.col("value") + 1000.0)
    cat.merge_upsert("t_events", fix, "event_id")
    out = cat.read("t_events", spark)
    assert out.count() == n
    got = {r["event_id"]: r["value"] for r in out.join(fix.select("event_id"), "event_id").collect()}
    want = {r["event_id"]: r["value"] for r in fix.collect()}
    assert got == want


def test_replay_is_idempotent(spark, staged, tmp_path):
    src, n = staged
    cat = TableCatalog(str(tmp_path / "wh4"))
    _run(spark, src, cat, str(tmp_path / "ck4"))
    before = sorted(
        (r["event_id"], r["value"]) for r in cat.read("t_events", spark).collect()
    )
    # crash-replay case: the same batch applied a second time
    batch = spark.read.parquet(os.path.join(src, "part-1.parquet"))
    cat.merge_upsert("t_events", batch, "event_id")
    after = sorted(
        (r["event_id"], r["value"]) for r in cat.read("t_events", spark).collect()
    )
    assert after == before

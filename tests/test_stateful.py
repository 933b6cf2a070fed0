"""applyInPandasWithState operators vs sequential Python oracles.

File source with maxFilesPerTrigger=1 gives deterministic micro-batches;
each operator's cross-batch state behavior is asserted against a ~10-line
sequential re-implementation (the reference-semantics style of
SURVEY.md §5: oracle per record id)."""

import os

import pandas as pd
import pytest

from mongodb_postproc_spark.streaming.stateful import (
    first_seen_stream,
    politeness_slots_stream,
)

SCHEMA = "url_canon string, host string, discovery_ts long"


def _write_batches(tmp_path, batches):
    d = tmp_path / "stream_in"
    os.makedirs(d, exist_ok=True)
    for i, rows in enumerate(batches):
        pd.DataFrame(rows, columns=["url_canon", "host", "discovery_ts"]).to_parquet(
            d / f"batch_{i:03d}.parquet", index=False
        )
    return str(d)


def _run_stream(spark, path, transform, name):
    src = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(path)
    )
    q = (
        transform(src)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}").toPandas()


BATCHES = [
    [  # batch 0: in-batch dup of u1
        ("http://h1.test/u1", "h1.test", 10),
        ("http://h1.test/u1", "h1.test", 12),
        ("http://h2.test/u2", "h2.test", 11),
    ],
    [  # batch 1: cross-batch dup of u1 + two new
        ("http://h1.test/u1", "h1.test", 20),
        ("http://h1.test/u3", "h1.test", 21),
        ("http://h2.test/u4", "h2.test", 22),
    ],
    [  # batch 2: cross-batch dup of u2, new u5
        ("http://h2.test/u2", "h2.test", 30),
        ("http://h1.test/u5", "h1.test", 31),
    ],
]


def test_first_seen_stream_dedups_across_batches(spark, tmp_path):
    path = _write_batches(tmp_path, BATCHES)
    out = _run_stream(spark, path, first_seen_stream, "t_first_seen")

    # sequential oracle
    seen, expect = set(), []
    for rows in BATCHES:
        for url, host, ts in sorted(rows, key=lambda r: (r[2], r[1])):
            if url not in seen:
                seen.add(url)
                expect.append((url, host, ts))
    got = sorted(map(tuple, out[["url_canon", "host", "discovery_ts"]].values.tolist()))
    assert got == sorted(expect)
    # exactly one emission per distinct url
    assert len(out) == out["url_canon"].nunique() == 5


def test_politeness_slots_continue_across_batches(spark, tmp_path):
    delay = 100
    path = _write_batches(tmp_path, BATCHES)
    out = _run_stream(
        spark, path, lambda df: politeness_slots_stream(df, delay_ms=delay), "t_slots"
    )

    # sequential oracle: per-host counter over batches, in-batch order by
    # (discovery_ts, url_canon)
    next_slot: dict = {}
    expect = {}
    for rows in BATCHES:
        by_host: dict = {}
        for url, host, ts in rows:
            by_host.setdefault(host, []).append((url, host, ts))
        for host, items in by_host.items():
            base = next_slot.get(host, 0)
            for i, (url, h, ts) in enumerate(sorted(items, key=lambda r: (r[2], r[0]))):
                expect[(url, ts)] = base + i * delay
            next_slot[host] = base + len(items) * delay

    assert len(out) == sum(len(b) for b in BATCHES)
    for _, r in out.iterrows():
        assert r["slot_ms"] == expect[(r["url_canon"], r["discovery_ts"])], r.to_dict()
    # per-host slots strictly increase delay apart
    for host, grp in out.groupby("host"):
        slots = sorted(grp["slot_ms"])
        assert all(b - a >= delay for a, b in zip(slots, slots[1:]))


@pytest.mark.parametrize("delay", [50])
def test_politeness_slots_single_batch_matches_window(spark, tmp_path, delay):
    """One micro-batch == the batch engine's rank-x-delay window semantics."""
    rows = [
        ("http://h1.test/a", "h1.test", 3),
        ("http://h1.test/b", "h1.test", 1),
        ("http://h1.test/c", "h1.test", 2),
    ]
    path = _write_batches(tmp_path, [rows])
    out = _run_stream(
        spark, path, lambda df: politeness_slots_stream(df, delay_ms=delay), "t_slots_w"
    )
    ordered = out.sort_values("slot_ms")["url_canon"].tolist()
    assert ordered == ["http://h1.test/b", "http://h1.test/c", "http://h1.test/a"]
    assert sorted(out["slot_ms"]) == [0, delay, 2 * delay]


IMG_SCHEMA = "image_id string, host string, n_bytes long, arrival_ts long"

IMG_BATCHES = [
    [  # batch 0: two hosts, mixed sizes
        ("im_a", "img0.test", 3000, 10),
        ("im_b", "img0.test", 3000, 11),
        ("im_c", "img1.test", 2000, 12),
    ],
    [  # batch 1: img0 crosses its 7500-byte shard boundary mid-batch
        ("im_d", "img0.test", 3000, 20),
        ("im_e", "img0.test", 3000, 21),
        ("im_f", "img1.test", 6000, 22),
    ],
    [  # batch 2: img1 crosses; img0 keeps filling shard 1
        ("im_g", "img1.test", 2000, 30),
        ("im_h", "img0.test", 3000, 31),
    ],
]


def _write_img_batches(tmp_path, batches):
    d = tmp_path / "img_stream_in"
    os.makedirs(d, exist_ok=True)
    for i, rows in enumerate(batches):
        pd.DataFrame(
            rows, columns=["image_id", "host", "n_bytes", "arrival_ts"]
        ).to_parquet(d / f"batch_{i:03d}.parquet", index=False)
    return str(d)


def test_shard_pack_stream_continues_offsets_across_batches(spark, tmp_path):
    from mongodb_postproc_spark.streaming.stateful import shard_pack_stream

    shard_bytes = 7500
    path = _write_img_batches(tmp_path, IMG_BATCHES)
    src = (
        spark.readStream.schema(IMG_SCHEMA).option("maxFilesPerTrigger", 1).parquet(path)
    )
    q = (
        shard_pack_stream(src, shard_bytes=shard_bytes)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_shard_pack")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    out = spark.sql("SELECT * FROM t_shard_pack").toPandas()

    # sequential oracle: per-host running byte offset across all batches,
    # in-batch order by (arrival_ts, image_id) — the exact packer contract
    offset: dict = {}
    expect = {}
    for rows in IMG_BATCHES:
        by_host: dict = {}
        for r in rows:
            by_host.setdefault(r[1], []).append(r)
        for host, items in by_host.items():
            off = offset.get(host, 0)
            for iid, h, nb, ts in sorted(items, key=lambda r: (r[3], r[0])):
                expect[iid] = off // shard_bytes
                off += nb
            offset[host] = off
    assert len(out) == sum(len(b) for b in IMG_BATCHES)
    for _, r in out.iterrows():
        assert r["shard_id"] == expect[r["image_id"]], r.to_dict()
    # the cross-batch boundary crossings actually happened: img0 (5x3000
    # bytes, offsets 0..12000) crosses into shard 1 during batch 1; img1
    # (2000+6000+2000, offsets 0/2000/8000) crosses during batch 2
    assert out[out.host == "img0.test"]["shard_id"].max() == 1
    assert out[out.host == "img1.test"]["shard_id"].max() == 1
    assert out[out.image_id == "im_e"]["shard_id"].iloc[0] == 1
    assert out[out.image_id == "im_g"]["shard_id"].iloc[0] == 1

    # single-stream result == the batch window packer on the union of all
    # batches (the mm_shard_pack shape): same running-sum, same floor
    allrows = pd.DataFrame(
        [r for b in IMG_BATCHES for r in b],
        columns=["image_id", "host", "n_bytes", "arrival_ts"],
    )
    bdf = spark.createDataFrame(allrows)
    bdf.createOrReplaceTempView("v_shard_batch")
    batch_out = spark.sql(f"""
        SELECT image_id,
               CAST(floor((sum(n_bytes) OVER (PARTITION BY host
                     ORDER BY arrival_ts, image_id
                     ROWS UNBOUNDED PRECEDING) - n_bytes) / {shard_bytes})
                    AS BIGINT) AS shard_id
        FROM v_shard_batch
    """).toPandas()
    merged = out.merge(batch_out, on="image_id", suffixes=("_stream", "_batch"))
    assert (merged["shard_id_stream"] == merged["shard_id_batch"]).all()

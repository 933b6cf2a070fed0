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

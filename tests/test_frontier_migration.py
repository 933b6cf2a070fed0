"""Legacy-checkpoint migration: a workdir written before retry support has
a frontier without attempts/fkey columns and a url-keyed delete chain.
run_round must migrate it once (compact + add columns) and continue the
crawl exactly — same fetch order / seen set as an uninterrupted new-format
run."""

import json
import os
from dataclasses import replace

from pyspark.sql import functions as F

from mongodb_postproc_spark.crawl.engine import FRONTIER_COLS, CrawlEngine
from mongodb_postproc_spark.crawl.simulator import simulate_crawl
from mongodb_postproc_spark.datagen.web import CrawlConfig, WebConfig

CFG = CrawlConfig(
    n_seeds=6,
    max_rounds=3,
    per_host_cap=4,
    web=WebConfig(n_hosts=6, hot_pages=60, cold_pages=14, seed="legacyfix-v1"),
)


def _downgrade_frontier(eng: CrawlEngine) -> None:
    """Rewrite the frontier to the pre-retry on-disk shape: discovery
    columns only, then a url-keyed global delete file (of nothing) so the
    manifest carries the legacy delete key the old engine used."""
    legacy = eng.catalog.read("frontier", eng.spark).select(*FRONTIER_COLS)
    eng.catalog.create_or_replace("frontier", legacy)
    eng.catalog.append_deletes(
        "frontier",
        eng.spark.createDataFrame([], "url_canon string").select("url_canon"),
        "url_canon",
        "global",
    )
    # point the committed state at the rewritten snapshots so resume
    # doesn't roll the downgrade back
    sp = eng._state_path()
    with open(sp) as f:
        state = json.load(f)
    state["snapshots"]["frontier"] = eng.catalog.snapshots("frontier")[-1]["id"]
    with open(sp, "w") as f:
        json.dump(state, f)


def test_legacy_frontier_resumes_exactly(spark, tmp_path):
    oracle = simulate_crawl(CFG)
    wd = str(tmp_path / "legacy")
    eng1 = CrawlEngine(spark, replace(CFG, max_rounds=1), wd)
    eng1.run()
    _downgrade_frontier(eng1)

    eng2 = CrawlEngine(spark, CFG, wd)
    eng2.run(resume=True)
    got = [
        (r["seq"], r["url_canon"], r["host"], r["round"])
        for r in eng2.fetch_log().collect()
    ]
    assert got == oracle.fetch_order
    assert {r["url_canon"] for r in eng2.seen_set().collect()} == oracle.seen
    # migration left the table in the new shape with the fkey delete chain
    front = eng2.catalog.read("frontier", spark)
    assert {"attempts", "fkey"} <= set(front.columns)
    assert front.filter(F.col("fkey").isNull()).count() == 0

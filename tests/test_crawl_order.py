"""THE north-rule gate: the Spark engine must reproduce the sequential
oracle's fetch ordering and URL-seen set exactly (the analog of the
reference's page-order crawl + distinct-key dedup,
/root/reference/findMissingPages.py:24-44)."""

import pytest

from mongodb_postproc_spark.crawl.engine import CrawlEngine, validate_images
from mongodb_postproc_spark.crawl.simulator import simulate_crawl
from mongodb_postproc_spark.datagen.web import CrawlConfig, WebConfig

CFG = CrawlConfig(
    n_seeds=6,
    max_rounds=3,
    per_host_cap=4,
    web=WebConfig(n_hosts=6, hot_pages=80, cold_pages=16, seed="fixture-v1"),
)


@pytest.fixture(scope="module")
def oracle():
    return simulate_crawl(CFG)


@pytest.fixture(scope="module")
def engine_run(spark, tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("crawl"))
    eng = CrawlEngine(spark, CFG, wd)
    stats = eng.run()
    return eng, stats


def test_fetch_order_exact_match(oracle, engine_run):
    eng, _ = engine_run
    got = [
        (r["seq"], r["url_canon"], r["host"], r["round"])
        for r in eng.fetch_log().collect()
    ]
    assert got == oracle.fetch_order


def test_seen_set_exact_match(oracle, engine_run):
    eng, _ = engine_run
    got = {r["url_canon"] for r in eng.seen_set().collect()}
    assert got == oracle.seen


def test_blocked_set_exact_match(oracle, engine_run):
    eng, _ = engine_run
    got = {r["url_canon"] for r in eng.catalog.read("blocked", eng.spark).collect()}
    assert got == oracle.blocked


def test_round_metrics_match(oracle, engine_run):
    _, stats = engine_run
    assert len(stats) == len(oracle.metrics)
    for s, m in zip(stats, oracle.metrics):
        assert (s.fetched, s.links_extracted, s.new_urls, s.frontier_after, s.seen_after) == (
            m["fetched"],
            m["links_extracted"],
            m["new_urls"],
            m["frontier_after"],
            m["seen_after"],
        ), (s, m)


def test_image_invariants_hold(engine_run):
    eng, _ = engine_run
    violations = validate_images(eng.images()).collect()
    assert violations == []


def test_images_one_per_fetch(oracle, engine_run):
    eng, _ = engine_run
    assert eng.images().count() == len(oracle.fetch_order)


def test_lineage_covers_all_fetches(oracle, engine_run):
    eng, _ = engine_run
    lineage = eng.catalog.read("lineage", eng.spark)
    total = lineage.groupBy().sum("rows_fetched").collect()[0][0]
    assert total == len(oracle.fetch_order)


def test_per_host_politeness_budget(engine_run):
    """No host exceeds its per-round fetch cap (the politeness budget the
    reference enforces with sleeps, findMissingPages.py:11-12,26)."""
    eng, _ = engine_run
    per = eng.fetch_log().groupBy("host", "round").count().collect()
    assert per and all(r["count"] <= CFG.per_host_cap for r in per), per

"""Sitemap ingestion: every distinct seed host publishes a sitemap whose
entries amplify the frontier at init — canonicalized, deduped against the
seeds (seeds win ties), robots-split. Combined here with the HTTP status
mix so the two features are exercised together end-to-end."""

import pytest

from mongodb_postproc_spark.crawl.canonicalize import canonicalize_py, host_py
from mongodb_postproc_spark.crawl.engine import CrawlEngine
from mongodb_postproc_spark.crawl.simulator import simulate_crawl
from mongodb_postproc_spark.datagen.web import CrawlConfig, SyntheticWeb, WebConfig

CFG = CrawlConfig(
    n_seeds=7,
    max_rounds=3,
    per_host_cap=4,
    max_attempts=2,
    web=WebConfig(
        n_hosts=7, hot_pages=90, cold_pages=24, seed="sitemapfix-v1",
        status_mix=True, sitemaps=True,
    ),
)


@pytest.fixture(scope="module")
def oracle():
    return simulate_crawl(CFG)


@pytest.fixture(scope="module")
def engine_run(spark, tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("crawl_sitemaps"))
    eng = CrawlEngine(spark, CFG, wd)
    stats = eng.run()
    return eng, stats


def _sitemap_canon(web: SyntheticWeb, hosts: set[str]) -> set[str]:
    out = set()
    for h in hosts:
        for raw in web.sitemap_urls(h):
            c = canonicalize_py(raw)
            if c is not None:
                out.add(c)
    return out


def test_fixture_exercises_sitemaps(oracle):
    web = SyntheticWeb(CFG.web)
    seed_canon = {
        c for c in (canonicalize_py(r) for r in web.seed_urls(CFG.n_seeds)) if c
    }
    hosts = {host_py(c) for c in seed_canon}
    sm = _sitemap_canon(web, hosts)
    assert sm, "fixture must generate sitemap entries"
    # sitemap-only URLs (not seeds) must exist and be seen from init
    only = sm - seed_canon
    assert only and only <= oracle.seen
    # at least one sitemap entry is robots-blocked
    assert sm & oracle.blocked
    # at least one sitemap-only URL is actually fetched in round 0
    r0 = {u for s, u, h, rnd in oracle.fetch_order if rnd == 0}
    assert only & r0


def test_fetch_order_exact_match(oracle, engine_run):
    eng, _ = engine_run
    got = [
        (r["seq"], r["url_canon"], r["host"], r["round"])
        for r in eng.fetch_log().collect()
    ]
    assert got == oracle.fetch_order


def test_seen_blocked_failed_exact_match(oracle, engine_run):
    eng, _ = engine_run
    assert {r["url_canon"] for r in eng.seen_set().collect()} == oracle.seen
    assert {
        r["url_canon"] for r in eng.catalog.read("blocked", eng.spark).collect()
    } == oracle.blocked
    assert {
        r["url_canon"]: r["status"] for r in eng.failed_set().collect()
    } == oracle.failed


def test_round_metrics_match(oracle, engine_run):
    _, stats = engine_run
    assert len(stats) == len(oracle.metrics)
    for s, m in zip(stats, oracle.metrics):
        assert (s.fetched, s.new_urls, s.frontier_after, s.seen_after,
                s.retried, s.failed) == (
            m["fetched"], m["new_urls"], m["frontier_after"], m["seen_after"],
            m["retried"], m["failed"],
        ), (s, m)


def test_sitemaps_off_is_byte_identical_default():
    from dataclasses import replace

    base = replace(CFG, web=replace(CFG.web, sitemaps=False, status_mix=False))
    r = simulate_crawl(base)
    web = SyntheticWeb(base.web)
    assert web.sitemap_urls("host0.test") == []
    # no retries/redirects/failures either: plain-200 crawl
    assert all(
        m["retried"] == m["failed"] == m["redirects"] == 0 for m in r.metrics
    )

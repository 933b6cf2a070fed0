"""Sequential reference-semantics crawl simulator (the ORACLE).

Mirrors the control flow of the reference's crawl loop
(/root/reference/findMissingPages.py:24-44): a single-threaded loop that
fetches in a deterministic order, extracts links in document order, inserts
every discovered id, and computes the seen set as a distinct-set operation.
Generalized to the north rule's frontier semantics:

CRAWL SPEC (normative — the Spark engine must reproduce this exactly):

  state: seen = set of canonical URLs ever discovered (seeds included);
         frontier = discovered, fetchable (robots-allowed), not yet fetched.

  seeds: canonicalized in list order; discovery_ts = index, priority = 0,
         depth = 0. Duplicate canonical seeds keep the first occurrence.
         Robots-blocked seeds enter `seen` + `blocked`, never the frontier.

  sitemaps (cfg.web.sitemaps): each distinct host among the canonical
         seeds publishes sitemap entries; entry at position i is discovered
         at init with discovery_ts = n_seeds + i, priority = 0, depth = 0.
         Seeds win dedup ties against sitemap entries (smaller ts); a URL
         cannot appear in two hosts' sitemaps (entries are host-local), so
         (url, ts) stays unambiguous. Blocked entries go to `blocked`.

  round r = 0..max_rounds-1, while the frontier is non-empty:
    1. schedule: within each host, order frontier entries by
       (priority ASC, discovery_ts ASC, url_canon ASC); take the first
       per_host_cap; entry at in-host rank k gets
       offset_ms = k * crawl_delay_ms(host).
    2. global fetch order: (offset_ms ASC, host ASC, url_canon ASC);
       consecutive seq numbers continue across rounds (0-based).
       [politeness: two same-host fetches are >= crawl_delay apart in
        slot time; order is a pure data property — no wall clock.]
    3. fetch each scheduled URL in seq order; the fetch returns
       status = status_for(url, attempts) (200 unless cfg.web.status_mix):
         200 → links_for(url) yields raw children at positions i
         301 → one child, the redirect Location, at position 0 (no payload)
         503 → transient: no children; if attempts+1 < max_attempts the URL
               re-enters the frontier with attempts+1, SAME discovery_ts
               and depth, priority+1 (backoff penalty — it sorts behind
               same-depth peers next round); else → failed dead-letter
         410 → permanently gone: no children, straight to failed.
       Every attempt consumes its politeness slot and a seq number.
       Child discovery_ts = seq * link_tick + i (the (page_no, link_index)
       total order of the reference, /root/reference/findMissingPages.py:
       24-35).
    4. discover: canonicalize children; first occurrence wins within the
       round (min discovery_ts); drop already-seen; add the rest to seen;
       robots-blocked go to blocked; others join the frontier with
       depth = parent_depth + 1, priority = depth, attempts = 0.
       (A retry re-insert is NOT a discovery — its URL is already seen and
       it bypasses robots re-checks.)
    5. unscheduled frontier entries carry over to the next round.

  outputs: fetch_order [(seq, url_canon, host, round)], seen set,
           blocked set, failed {url: final_status}, per-round metrics.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..datagen.web import CrawlConfig, SyntheticWeb, robots_blocked
from .canonicalize import canonicalize_py, host_py


@dataclass
class SimResult:
    fetch_order: list[tuple[int, str, str, int]]  # (seq, url_canon, host, round)
    seen: set[str]
    blocked: set[str]
    metrics: list[dict] = field(default_factory=list)
    failed: dict[str, int] = field(default_factory=dict)  # url -> final status


def simulate_crawl(cfg: CrawlConfig) -> SimResult:
    web = SyntheticWeb(cfg.web)
    robots = {r["host"]: r for r in web.robots_rows()}

    seen: set[str] = set()
    blocked: set[str] = set()
    failed: dict[str, int] = {}
    # frontier entries: dict url_canon -> (priority, discovery_ts, depth, attempts)
    frontier: dict[str, tuple[int, int, int, int]] = {}

    def discover(url_canon: str, priority: int, ts: int, depth: int) -> None:
        if url_canon in seen:
            return
        seen.add(url_canon)
        host = host_py(url_canon)
        rules = robots.get(host)
        path = url_canon.split(host, 1)[1]
        if rules and robots_blocked(path, rules["rules"]):
            blocked.add(url_canon)
            return
        frontier[url_canon] = (priority, ts, depth, 0)

    seed_hosts: set[str] = set()
    for idx, raw in enumerate(web.seed_urls(cfg.n_seeds)):
        canon = canonicalize_py(raw)
        if canon is not None:
            seed_hosts.add(host_py(canon))
            discover(canon, 0, idx, 0)
    if cfg.web.sitemaps:
        for host in sorted(seed_hosts):
            for i, raw in enumerate(web.sitemap_urls(host)):
                canon = canonicalize_py(raw)
                if canon is not None:
                    discover(canon, 0, cfg.n_seeds + i, 0)

    fetch_order: list[tuple[int, str, str, int]] = []
    metrics: list[dict] = []
    seq = 0
    for rnd in range(cfg.max_rounds):
        if not frontier:
            break
        # --- schedule: per-host politeness slots
        by_host: dict[str, list[str]] = {}
        for u in frontier:
            by_host.setdefault(host_py(u), []).append(u)
        scheduled: list[tuple[int, str, str]] = []  # (offset_ms, host, url)
        for host, urls in by_host.items():
            delay = robots[host]["crawl_delay_ms"] if host in robots else 100
            urls.sort(key=lambda u: (frontier[u][0], frontier[u][1], u))
            for k, u in enumerate(urls[: cfg.per_host_cap]):
                scheduled.append((k * delay, host, u))
        scheduled.sort()  # (offset_ms, host, url_canon)

        # --- fetch in order; extract + discover; route failures
        n_links = n_new = n_redirects = n_retried = n_failed = 0
        for offset_ms, host, url in scheduled:
            priority, ts, depth, attempts = frontier.pop(url)
            fetch_order.append((seq, url, host, rnd))
            status = web.status_for(url, attempts)
            if status == 503:
                if attempts + 1 < cfg.max_attempts:
                    # backoff re-insert: NOT a discovery (already seen)
                    frontier[url] = (priority + 1, ts, depth, attempts + 1)
                    n_retried += 1
                else:
                    failed[url] = status
                    n_failed += 1
            elif status == 410:
                failed[url] = status
                n_failed += 1
            else:
                if status == 301:
                    n_redirects += 1
                for i, raw_child in enumerate(web.links_for_status(url, status)):
                    n_links += 1
                    canon = canonicalize_py(raw_child)
                    if canon is None:
                        continue
                    before = len(seen)
                    discover(canon, depth + 1, seq * cfg.link_tick + i, depth + 1)
                    n_new += len(seen) - before
            seq += 1
        metrics.append(
            {
                "round": rnd,
                "fetched": len(scheduled),
                "links_extracted": n_links,
                "new_urls": n_new,
                "frontier_after": len(frontier),
                "seen_after": len(seen),
                "redirects": n_redirects,
                "retried": n_retried,
                "failed": n_failed,
            }
        )
    return SimResult(
        fetch_order=fetch_order, seen=seen, blocked=blocked, metrics=metrics, failed=failed
    )

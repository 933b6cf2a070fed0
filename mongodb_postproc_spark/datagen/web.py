"""Deterministic synthetic web graph.

Finite, seeded link structure shared by BOTH crawl implementations (the
sequential oracle simulator and the Spark engine). The *graph* is shared; the
*crawl logic* — ordering, dedup, politeness — is implemented independently on
each side, which is exactly what the fixtures test.

Properties engineered in:
- **Hot-host skew**: host0 owns ~10x the page space and receives ~30% of all
  links (the skew the north rule requires explicit salting for).
- **Canonicalization noise**: raw links carry uppercase hosts, :80 ports,
  fragments, ./ and ../ segments, duplicate slashes, and shuffled query
  params — many raw spellings, one canonical URL (dedup must collapse them,
  mirroring the reference's distinct-key dedup,
  /root/reference/findMissingPages.py:38-42).
- **Robots-blocked zone**: /private/... paths, per-host disallow prefixes and
  crawl delays.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..functions.hashes import h60


@dataclass(frozen=True)
class WebConfig:
    n_hosts: int = 12
    hot_pages: int = 400  # pages on host0
    cold_pages: int = 48  # pages on every other host
    seed: str = "web-v1"
    frag_queries: bool = True
    # HTTP status mix: when True, fetches deterministically return 301
    # (redirect), 410 (permanently gone) and 503 (transient, succeeds after
    # 1-2 retries) alongside 200 — the failure surface a real crawler
    # schedules around. Default False keeps every pre-existing fixture
    # byte-identical (all fetches 200).
    status_mix: bool = False
    # sitemaps: when True, every host that appears among the canonical
    # seeds publishes a sitemap (named by its robots.txt) whose entries
    # amplify the seed frontier at init — deduped against the seeds and
    # robots-split like any other discovery. Default False: no sitemaps,
    # pre-existing fixtures byte-identical.
    sitemaps: bool = False

    def pages(self, host_i: int) -> int:
        return self.hot_pages if host_i == 0 else self.cold_pages


def host_name(i: int) -> str:
    return f"host{i}.test"


class SyntheticWeb:
    def __init__(self, cfg: WebConfig = WebConfig()):
        self.cfg = cfg

    # ------------------------------------------------------------ pages
    def page_url(self, host_i: int, page_n: int, q: int | None = None) -> str:
        base = f"http://{host_name(host_i)}/p/{page_n}"
        if q is not None:
            return f"{base}?a={q}&b={q % 3}"
        return base

    def _noisy(self, host_i: int, page_n: int, q: int | None, hv: int) -> str:
        """A raw spelling of page_url that canonicalizes back to it."""
        host = host_name(host_i)
        path = f"/p/{page_n}"
        variant = hv % 8
        if variant == 1:
            host = host.upper()
        elif variant == 2:
            host = host + ":80"
        elif variant == 3:
            path = f"/x/..{path}"
        elif variant == 4:
            path = f"/./p/./{page_n}"
        elif variant == 5:
            path = f"//p//{page_n}"
        query = ""
        if q is not None:
            parts = [f"a={q}", f"b={q % 3}"]
            if hv % 2 == 1:
                parts.reverse()  # unsorted on the wire; canonicalizer sorts
            query = "?" + "&".join(parts)
        frag = f"#s{hv % 4}" if variant == 6 else ""
        return f"http://{host}{path}{query}{frag}"

    # ------------------------------------------------------------ links
    def links_for(self, url_canon: str) -> list[str]:
        """Deterministic raw out-links of a canonical page URL (document
        order — link position is the secondary discovery-order key, the
        analog of xpath order in /root/reference/findMissingPages.py:31-35)."""
        cfg = self.cfg
        h0 = h60(cfg.seed + "|deg|" + url_canon)
        out_degree = 4 + (h0 % 5)  # 4..8
        links = []
        for k in range(out_degree):
            hv = h60(f"{cfg.seed}|lnk|{url_canon}|{k}")
            if hv % 10 < 3:
                tgt_host = 0  # 30% of links point at the hot host
            else:
                tgt_host = hv % cfg.n_hosts
            page = (hv >> 8) % cfg.pages(tgt_host)
            if hv % 17 == 0:
                links.append(f"http://{host_name(tgt_host)}/private/{page}")
                continue
            q = (hv >> 16) % 7 if (cfg.frag_queries and hv % 5 == 0) else None
            links.append(self._noisy(tgt_host, page, q, hv >> 4))
        return links

    # ------------------------------------------------------------ status
    def status_for(self, url_canon: str, attempts: int) -> int:
        """Deterministic HTTP status of fetching ``url_canon`` on retry
        number ``attempts`` (0 = first try). Pure function of (url, attempts)
        so the sequential oracle and the Spark engine agree at any
        parallelism. Mix (when ``status_mix``): ~4% redirects, ~3% gone,
        ~7% transient (each succeeding on its 1st or 2nd retry), rest 200.
        The per-URL transient budget mirrors the reference's fixed retry
        loop around flaky page fetches (/root/reference/findMissingPages.py:
        26-29 re-requests inside one politeness sleep)."""
        if not self.cfg.status_mix:
            return 200
        hv = h60(self.cfg.seed + "|st|" + url_canon)
        if hv % 23 == 0:
            return 301
        if hv % 31 == 0:
            return 410
        if hv % 29 < 2:
            needed = 1 + ((hv >> 8) % 2)  # succeeds on attempt 1 or 2
            return 200 if attempts >= needed else 503
        return 200

    def redirect_target(self, url_canon: str) -> str:
        """Raw Location header of a 301 page — a deterministic (possibly
        noisy) spelling of another page; the crawler treats it as a
        discovery at link position 0."""
        hv = h60(self.cfg.seed + "|rt|" + url_canon)
        tgt_host = hv % self.cfg.n_hosts
        page = (hv >> 8) % self.cfg.pages(tgt_host)
        q = (hv >> 16) % 7 if (self.cfg.frag_queries and hv % 5 == 0) else None
        return self._noisy(tgt_host, page, q, hv >> 4)

    def links_for_status(self, url_canon: str, status: int) -> list[str]:
        """Out-links as a function of fetch status: a 200 page yields its
        document links, a 301 yields exactly its Location target (the
        redirect IS a discovery), failures yield nothing."""
        if status == 200:
            return self.links_for(url_canon)
        if status == 301:
            return [self.redirect_target(url_canon)]
        return []

    # ------------------------------------------------------------ seeds
    def seed_url_at(self, s: int) -> str:
        """Raw seed URL for index ``s`` — a pure function of the index, so
        seed generation distributes over any partitioning of [0, n)."""
        host_i = s % self.cfg.n_hosts
        hv = h60(f"{self.cfg.seed}|seed|{s}")
        page = hv % self.cfg.pages(host_i)
        return self._noisy(host_i, page, None, hv >> 4)

    def seed_urls(self, n_seeds: int) -> list[str]:
        """Raw seed list (with noise) — one seed page per host round-robin."""
        return [self.seed_url_at(s) for s in range(n_seeds)]

    # ------------------------------------------------------------ sitemaps
    def sitemap_urls(self, host: str) -> list[str]:
        """Raw entries of ``host``'s sitemap, in document order (the
        sitemap.xml a real robots.txt would name). Entries point at the
        host's own pages; they carry the same canonicalization noise as
        links, occasionally duplicate a page the seeds/links also reach
        (dedup must collapse), and occasionally list a robots-blocked
        /private path (real sitemaps do list pages robots then forbids —
        the robots split must catch them)."""
        if not self.cfg.sitemaps:
            return []
        host_i = int(host[4:host.index(".")])  # host_name(i) = f"host{i}.test"
        hv = h60(self.cfg.seed + "|sm|" + host)
        out = []
        for i in range(hv % 7):  # 0..6 entries per host
            e = h60(f"{self.cfg.seed}|smu|{host}|{i}")
            page = (e >> 8) % self.cfg.pages(host_i)
            if e % 13 == 0:
                out.append(f"http://{host}/private/{page}")
            else:
                q = (e >> 16) % 7 if (self.cfg.frag_queries and e % 5 == 0) else None
                out.append(self._noisy(host_i, page, q, e >> 4))
        return out

    # ------------------------------------------------------------ robots
    def robots_rows(self) -> list[dict]:
        """Per-host robots rules (RFC 9309 subset) + crawl delay (the
        politeness budget — analog of the fixed sleeps at
        /root/reference/findMissingPages.py:11-12,26).

        Each rule is {pattern, allow, plen}: patterns are path prefixes
        that may contain one ``*`` wildcard and an optional trailing ``$``
        end-anchor; precedence is RFC 9309 longest-match (pattern octet
        length, stored as plen), Allow winning ties. Hosts deterministically
        get plain-prefix disallows, a wildcard disallow, and an
        allow-overrides-disallow pair so every precedence branch is live
        in the fixtures."""
        rows = []
        for i in range(self.cfg.n_hosts):
            hv = h60(f"{self.cfg.seed}|robots|{i}")
            rules = [{"pattern": "/private", "allow": False}]
            if hv % 3 == 0:
                rules.append({"pattern": "/tmp", "allow": False})
            if hv % 4 == 0:
                # wildcard + end anchor: any /p/ page whose number ends in 7
                rules.append({"pattern": "/p/*7$", "allow": False})
            if hv % 5 == 0:
                # longest-match precedence: /p/1... blocked, but /p/12...
                # re-allowed (tie on length resolves to Allow per the RFC)
                rules.append({"pattern": "/p/1*", "allow": False})
                rules.append({"pattern": "/p/12", "allow": True})
            for r in rules:
                r["plen"] = len(r["pattern"])
            rows.append(
                {
                    "host": host_name(i),
                    "rules": rules,
                    "crawl_delay_ms": int(50 * (1 + hv % 5)),  # 50..250ms
                }
            )
        return rows

    def is_blocked(self, url_canon: str, robots: dict[str, list[dict]] | None = None) -> bool:
        if robots is None:
            robots = {r["host"]: r["rules"] for r in self.robots_rows()}
        from ..crawl.canonicalize import host_py

        host = host_py(url_canon)
        path = url_canon.split(host, 1)[1]
        return robots_blocked(path, robots.get(host, []))


def _rule_matches(path: str, pattern: str) -> bool:
    """RFC 9309 path match: pattern is a prefix; one ``*`` spans any run;
    trailing ``$`` anchors the end. (Generated fixtures use at most one
    wildcard; the engine mirrors this matcher with native SQL functions —
    the general multi-* case would drop to a regex rlike.)"""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    if "*" not in pattern:
        return path == pattern if anchored else path.startswith(pattern)
    pre, suf = pattern.split("*", 1)
    if not path.startswith(pre):
        return False
    rest = path[len(pre):]
    return rest.endswith(suf) if anchored else suf in rest


def robots_blocked(path: str, rules: list[dict]) -> bool:
    """Longest-match precedence, Allow wins ties, no match -> allowed.
    The python mirror of the engine's native-SQL evaluator
    (crawl/engine.py _blocked_col); the sequential simulator uses this."""
    best = None
    for r in rules:
        if _rule_matches(path, r["pattern"]):
            key = (r["plen"], 1 if r["allow"] else 0)
            if best is None or key > best:
                best = key
    return best is not None and best[1] == 0


@dataclass(frozen=True)
class CrawlConfig:
    """Crawl policy knobs (shared by oracle and engine)."""

    n_seeds: int = 12
    max_rounds: int = 4
    per_host_cap: int = 8  # max fetches per host per round (politeness budget)
    link_tick: int = 1000  # discovery_ts = fetch_seq * link_tick + link_index
    # transient-failure budget: a URL whose fetch returns 503 re-enters the
    # frontier with attempts+1 and a +1 priority penalty (backoff: it sorts
    # behind same-depth peers) until it has been tried max_attempts times,
    # then lands in the `failed` dead-letter table and is never refetched
    max_attempts: int = 3
    web: WebConfig = field(default_factory=WebConfig)

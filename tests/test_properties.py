"""Adversarial property tests: the pure-Python twins and the Spark
column-expression implementations must agree on fuzzed inputs, not only on
the corpora the synthetic web happens to emit.

Spark comparisons batch the whole fuzz corpus into ONE job (hypothesis
driving a Spark action per example would be pathologically slow); the
python-only properties (idempotence) run under hypothesis directly.
Generators stay inside the documented canonicalization domain (ASCII,
dot-traversal depth <= MAX_DOT_DEPTH) — outside it the two sides are
allowed to differ by spec."""

import random

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mongodb_postproc_spark.crawl.canonicalize import (
    MAX_DOT_DEPTH,
    canonical_url_col,
    canonicalize_py,
)
from mongodb_postproc_spark.crawl.engine import CrawlEngine
from mongodb_postproc_spark.datagen.web import robots_blocked

# --------------------------------------------------------------------- urls

_SCHEMES = ["http", "Http", "HTTP", "https", "HtTpS", "ftp", "x+y.z-1"]
_HOSTS = ["Host1.Test", "h", "A.B.C.test", "h-x.y", "host10.test"]
_PORTS = ["", ":80", ":443", ":8080", ":0"]
_SEGS = ["a", "b", "P7", ".", "..", "", "x.y", "seg-1", "*", "%20",
         # percent-escape corpus: unreserved decodes (%7E/%41/%61), reserved
         # keeps + hex uppercasing (%2f), double-escape (%2541), dangling /
         # invalid escapes (%, %4, %zz), mid-segment escapes
         "%7Euser", "%7euser", "%41", "%61b", "%2F", "%2f", "%2541",
         "%", "%4", "%zz", "a%5Fb", "%C3%A9", "p%%41"]
_PARAMS = ["a=1", "b=2", "z", "a=", "m=3", "B=9", "a=1", "x=%7E1", "a=%2Fb", "k=%6a"]


def _random_url(rng: random.Random) -> str:
    scheme = rng.choice(_SCHEMES)
    host = rng.choice(_HOSTS)
    port = rng.choice(_PORTS)
    n = rng.randint(0, 6)
    segs = [rng.choice(_SEGS) for _ in range(n)]
    # stay within the documented ".." resolution bound
    while segs.count("..") > MAX_DOT_DEPTH:
        segs.remove("..")
    path = "/" + "/".join(segs) if segs else rng.choice(["", "/"])
    q = ""
    if rng.random() < 0.5:
        q = "?" + "&".join(rng.choice(_PARAMS) for _ in range(rng.randint(0, 3)))
    frag = "#frag" if rng.random() < 0.3 else ""
    ws = " " if rng.random() < 0.2 else ""
    body = f"{scheme}://{host}{port}{path}{q}{frag}"
    if rng.random() < 0.1:  # schemeless / garbage rows must canonicalize NULL
        body = body.split("://", 1)[1]
    return f"{ws}{body}{ws}"


def test_spark_vs_python_on_fuzzed_urls(spark):
    rng = random.Random("canon-fuzz-v1")
    raws = sorted({_random_url(rng) for _ in range(600)})
    out = (
        spark.createDataFrame(pd.DataFrame({"raw": raws}))
        .withColumn("canon", canonical_url_col(F.col("raw")))
        .collect()
    )
    mismatches = [
        (r["raw"], r["canon"], canonicalize_py(r["raw"]))
        for r in out
        if r["canon"] != canonicalize_py(r["raw"])
    ]
    assert not mismatches, mismatches[:5]


_IRI_SEGS = _SEGS + ["café", "päth", "日本", "ü", "ñ-x", "π.y", "a é"]
_IRI_PARAMS = _PARAMS + ["é=1", "k=ü", "日=本", "%C3%A9=2"]
_IRI_HOSTS = _HOSTS + ["Bücher.example", "日本語.example", "hoſt1.test"]


def _random_iri(rng: random.Random) -> str:
    scheme = rng.choice(["http", "https", "HTTP"])
    host = rng.choice(_IRI_HOSTS)
    n = rng.randint(0, 5)
    segs = [rng.choice(_IRI_SEGS) for _ in range(n)]
    while segs.count("..") > MAX_DOT_DEPTH:
        segs.remove("..")
    path = "/" + "/".join(segs) if segs else rng.choice(["", "/"])
    q = ""
    if rng.random() < 0.5:
        q = "?" + "&".join(rng.choice(_IRI_PARAMS) for _ in range(rng.randint(0, 3)))
    return f"{scheme}://{host}{path}{q}"


def test_spark_pipeline_vs_python_on_fuzzed_iris(spark):
    """Full engine pipeline (native hot path, then the observation-gated
    rare path) equals the python twin bytewise over non-ASCII IRIs — hosts
    (IDN, step 9) and paths/queries (RFC 3987, step 10) both."""
    from mongodb_postproc_spark.crawl.canonicalize import idn_normalize_urls

    rng = random.Random("iri-fuzz-v1")
    raws = sorted({_random_iri(rng) for _ in range(400)})
    base = (
        spark.createDataFrame(pd.DataFrame({"raw": raws}))
        .withColumn("url_canon", canonical_url_col(F.col("raw")))
        .withColumn("host", F.lit(""))
        .filter(F.col("url_canon").isNotNull())
    )
    # idn_normalize_urls passes ASCII rows through untouched, so running the
    # whole corpus through it realizes exactly the engine's split-union
    out = idn_normalize_urls(base).collect()
    mismatches = [
        (r["raw"], r["url_canon"], canonicalize_py(r["raw"]))
        for r in out
        if r["url_canon"] != canonicalize_py(r["raw"])
    ]
    assert not mismatches, mismatches[:5]


def test_canonicalize_py_idempotent_on_iris():
    """Canonical keys of non-ASCII IRIs are fixed points (encoding happens
    before query sorting, so re-canonicalizing cannot reorder params)."""
    rng = random.Random("iri-idem-v1")
    for _ in range(500):
        u = _random_iri(rng)
        c = canonicalize_py(u)
        if c is not None:
            assert canonicalize_py(c) == c, (u, c, canonicalize_py(c))


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=0, max_value=2**63 - 1))
def test_canonicalize_py_idempotent(seed):
    u = _random_url(random.Random(seed))
    c = canonicalize_py(u)
    if c is not None:
        assert canonicalize_py(c) == c, (u, c, canonicalize_py(c))


_IDN_ALPHABET = "abü日本語πрусскийñçø①ſ-."


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=_IDN_ALPHABET, min_size=1, max_size=20))
def test_canonicalize_py_idn_idempotent_and_collapsing(host):
    """IDN canonical keys are fixed points, and the unicode spelling and its
    xn-- form share one key (what the seen-set dedup hinges on)."""
    u = f"http://{host}/p/1"
    c = canonicalize_py(u)
    if c is None:
        return
    assert canonicalize_py(c) == c, (u, c)
    # the canonical key's own host is already fully normalized
    from mongodb_postproc_spark.crawl.canonicalize import host_py, idn_host_py

    h = host_py(c)
    assert idn_host_py(h) == h, (u, c, h)


@settings(max_examples=200, deadline=None)
@given(
    st.text(
        alphabet="ab/.:?&=#*$% \thttp",
        max_size=40,
    )
)
def test_canonicalize_py_total_and_stable(s):
    """Never raises on arbitrary junk; NULL or a string starting scheme://."""
    c = canonicalize_py(s)
    if c is not None:
        assert "://" in c
        assert "#" not in c


# ------------------------------------------------------------------- robots

_PAT_SEGS = ["/a", "/b", "/p/1", "/p/12", "/x", "/priv", "7", "2", ""]


def _random_pattern(rng: random.Random) -> str:
    base = "".join(rng.choice(_PAT_SEGS) for _ in range(rng.randint(1, 3)))
    if not base.startswith("/"):
        base = "/" + base
    if rng.random() < 0.5:  # at most one wildcard (generated-fixture domain)
        pos = rng.randint(1, len(base))
        base = base[:pos] + "*" + base[pos:]
    if rng.random() < 0.3:
        base += "$"
    return base


def _random_path(rng: random.Random) -> str:
    p = "".join(rng.choice(_PAT_SEGS) for _ in range(rng.randint(1, 4)))
    return p if p.startswith("/") else "/" + p


def test_robots_sql_vs_python_on_fuzzed_rules(spark):
    rng = random.Random("robots-fuzz-v1")
    rows = []
    for case in range(80):
        rules = []
        for _ in range(rng.randint(1, 5)):
            pat = _random_pattern(rng)
            rules.append({"pattern": pat, "allow": rng.random() < 0.4, "plen": len(pat)})
        for _ in range(6):
            path = _random_path(rng)
            rows.append(
                {
                    "case": case,
                    "url_canon": f"http://h.test{path}",
                    "path": path,
                    "rules": [(r["pattern"], r["allow"], r["plen"]) for r in rules],
                    "want": robots_blocked(path, rules),
                }
            )
    df = spark.createDataFrame(
        [(r["case"], r["url_canon"], r["rules"]) for r in rows],
        f"case long, url_canon string, rules {CrawlEngine.RULES_T}",
    )
    got = {
        (r["case"], r["url_canon"]): r["__blocked"]
        for r in df.withColumn("__blocked", CrawlEngine._blocked_col())
        .select("case", "url_canon", "__blocked")
        .collect()
    }
    mismatches = [
        (r["case"], r["path"], r["rules"], r["want"], got[(r["case"], r["url_canon"])])
        for r in rows
        if got[(r["case"], r["url_canon"])] is not r["want"]
    ]
    assert not mismatches, mismatches[:5]

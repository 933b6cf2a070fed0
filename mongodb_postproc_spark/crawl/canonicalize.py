"""URL canonicalization — implemented twice, on purpose.

``canonicalize_py`` is the sequential reference-semantics version used by the
crawl oracle/simulator; ``with_canonical_url`` is the Spark column-expression
version used by the engine (pure ``pyspark.sql.functions`` — stays inside
whole-stage codegen, no Python in the hot path). Both implement the SAME
bounded algorithm, so a property test can assert byte-equality over any URL
corpus; that equality is what makes the engine's seen-set match the oracle's
(the reference's dedup key is the extracted id string,
/root/reference/findMissingPages.py:33-42 — ours is the canonical URL).

Normalization spec (RFC 3986 subset, bounded so it is expressible as a fixed
chain of regex rewrites):
  1. trim whitespace; strip the fragment (``#...``).
  2. require ``scheme://``; anything else canonicalizes to NULL (dropped).
  3. lowercase scheme and host.
  4. drop default ports (http:80, https:443).
  5. empty path -> "/"; collapse duplicate slashes.
  6. resolve "." and ".." segments (bounded to MAX_DOT_DEPTH iterations —
     deeper traversals than any generated URL; both implementations share
     the bound so they agree by construction).
  7. sort query parameters bytewise; drop an empty query.

Percent-escape re-encoding and IDN are out of scope (the synthetic web is
ASCII); noted here so the gap is explicit.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

MAX_DOT_DEPTH = 8

_SCHEME_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.\-]*)://")


def canonicalize_py(url: str | None) -> str | None:
    """Pure-Python canonicalizer (oracle side)."""
    if url is None:
        return None
    u = url.strip()
    u = re.sub(r"#.*$", "", u)
    m = _SCHEME_RE.match(u)
    if not m:
        return None
    scheme = m.group(1).lower()
    rest = u[m.end():]
    am = re.match(r"^([^/?#]*)", rest)
    authority = am.group(1).lower()
    rest = rest[am.end():]
    if scheme == "http":
        authority = re.sub(r":80$", "", authority)
    elif scheme == "https":
        authority = re.sub(r":443$", "", authority)
    if not authority:
        return None
    qpos = rest.find("?")
    if qpos >= 0:
        path, query = rest[:qpos], rest[qpos + 1:]
    else:
        path, query = rest, ""
    if path == "":
        path = "/"
    path = re.sub(r"/{2,}", "/", path)
    for _ in range(MAX_DOT_DEPTH):
        path = re.sub(r"/\./", "/", path)
    path = re.sub(r"/\.$", "/", path)
    for _ in range(MAX_DOT_DEPTH):
        path = re.sub(r"/[^/]+/\.\./", "/", path, count=1)
    path = re.sub(r"/[^/]+/\.\.$", "/", path)
    for _ in range(MAX_DOT_DEPTH):
        path = re.sub(r"^/\.\./", "/", path)
    path = re.sub(r"^/\.\.$", "/", path)
    if query:
        query = "&".join(sorted(query.split("&")))
        return f"{scheme}://{authority}{path}?{query}"
    return f"{scheme}://{authority}{path}"


def canonical_url_col(url: Column) -> Column:
    """Spark column-expression canonicalizer (engine side).

    Identical bounded algorithm as :func:`canonicalize_py`; all regexp_*
    functions evaluate JVM-side under whole-stage codegen, so canonicalizing
    10^10 URLs is a pure map stage with no Python round-trip.
    """
    u = F.regexp_replace(F.trim(url), r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    after = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    authority = F.lower(F.regexp_extract(after, r"^([^/?#]*)", 1))
    authority = (
        F.when(scheme == "http", F.regexp_replace(authority, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(authority, r":443$", ""))
        .otherwise(authority)
    )
    rest = F.regexp_replace(after, r"^[^/?#]*", "")
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    query = F.when(rest.contains("?"), F.regexp_replace(rest, r"^[^?]*\?", "")).otherwise(
        F.lit("")
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = F.regexp_replace(path, r"/{2,}", "/")
    for _ in range(MAX_DOT_DEPTH):
        path = F.regexp_replace(path, r"/\./", "/")
    path = F.regexp_replace(path, r"/\.$", "/")
    for _ in range(MAX_DOT_DEPTH):
        # Python side uses count=1; Spark regexp_replace replaces all
        # non-overlapping matches per pass. Non-overlap means "/a/../b/../c"
        # resolves identically either way ("/b/../c" -> "/c" after pass 2 in
        # Python; Spark pass 1 rewrites both); overlapping chains
        # ("/a/b/../../c") need one pass per level in BOTH implementations,
        # hence the shared MAX_DOT_DEPTH bound keeps them equal.
        path = F.regexp_replace(path, r"/[^/]+/\.\./", "/")
    path = F.regexp_replace(path, r"/[^/]+/\.\.$", "/")
    for _ in range(MAX_DOT_DEPTH):
        path = F.regexp_replace(path, r"^/\.\./", "/")
    path = F.regexp_replace(path, r"^/\.\.$", "/")
    sorted_query = F.array_join(F.array_sort(F.split(query, "&")), "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        authority,
        path,
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), sorted_query)),
    )
    return F.when((scheme == "") | (authority == ""), F.lit(None)).otherwise(canon)


def host_col(url_canon: Column) -> Column:
    """Host (authority without port) of an already-canonical URL."""
    return F.regexp_extract(url_canon, r"^[a-z][a-z0-9+.\-]*://([^/:?#]*)", 1)


def host_py(url_canon: str) -> str:
    m = re.match(r"^[a-z][a-z0-9+.\-]*://([^/:?#]*)", url_canon)
    return m.group(1) if m else ""

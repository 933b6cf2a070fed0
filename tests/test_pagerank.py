"""Integer-exact fixed-iteration PageRank (operators/graph.py).

Hand-checkable 3-node path (symmetrized) pins the exact micro-unit ranks
after one iteration; a reference Python implementation (same integer
arithmetic, dict-based) cross-checks multi-iteration values on seeded
random graphs; and the registered `graph_pagerank` query's Spark output is
oracle-gated by tests/test_oracle_subset.py like every registry entry.
"""

from __future__ import annotations

import random

from mongodb_postproc_spark.operators.graph import PR_SCALE, pagerank_fixed


def _pagerank_py(edges, iters):
    """Reference: identical integer arithmetic over adjacency dicts."""
    edges = {(a, b) for a, b in edges if a != b}
    out = {}
    for a, b in edges:
        out.setdefault(a, set()).add(b)
    r = {n: PR_SCALE for n in out}
    for _ in range(iters):
        inbound = {}
        for a, nbrs in out.items():
            c = r[a] // len(nbrs)
            for b in nbrs:
                inbound[b] = inbound.get(b, 0) + c
        r = {n: PR_SCALE * 15 // 100 + (85 * s) // 100 for n, s in inbound.items()}
    return r


def _sym(pairs):
    return [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]


def test_path3_one_iteration_exact(spark):
    # path 1-2-3 symmetrized: degrees 1:1, 2:2, 3:1
    # contribs: 1->2: 1e6, 2->1: 5e5, 2->3: 5e5, 3->2: 1e6
    # r1(1) = 150000 + 85*500000//100  = 575000
    # r1(2) = 150000 + 85*2000000//100 = 1850000
    e = spark.createDataFrame(_sym([(1, 2), (2, 3)]), "src long, dst long")
    got = {r["node"]: r["r"] for r in pagerank_fixed(e, iters=1).collect()}
    assert got == {1: 575_000, 2: 1_850_000, 3: 575_000}


def test_random_graphs_match_reference(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 12 + 4 * trial
        pairs = {(rng.randrange(n), rng.randrange(n)) for _ in range(3 * n)}
        edges = _sym([(a, b) for a, b in pairs if a != b])
        if not edges:
            continue
        e = spark.createDataFrame(edges, "src long, dst long")
        got = {r["node"]: r["r"] for r in pagerank_fixed(e, iters=3).collect()}
        assert got == _pagerank_py(edges, 3)


def test_rank_mass_and_order(spark):
    # star: hub 0 connected to 1..6 (symmetrized) — hub must outrank leaves,
    # all leaves tie exactly (integer arithmetic, no float noise)
    e = spark.createDataFrame(_sym([(0, i) for i in range(1, 7)]), "src long, dst long")
    got = {r["node"]: r["r"] for r in pagerank_fixed(e, iters=3).collect()}
    leaves = {got[i] for i in range(1, 7)}
    assert len(leaves) == 1
    assert got[0] > next(iter(leaves))

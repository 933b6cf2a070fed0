"""Large-star/small-star connected components vs an independent union-find.

Three graph shapes stress different failure modes:
- seeded sparse random graphs (the general case),
- two dense cliques joined by one bridge edge (merge correctness),
- a 256-node path (adversarial diameter: min-label propagation needs 255
  sweeps; the alternating star algorithm must converge in O(log^2 n) rounds —
  pinned at <=14 here, which is what makes it the documented scale upgrade).

Also asserts the registered query `dedup_cluster_components_star` returns
exactly the same rows as the min-label `dedup_cluster_components` on the
real LSH candidate graph at sf0.001.
"""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from mongodb_postproc_spark.operators.graph import connected_components_star


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id label per component
    return {n: find(n) for n in parent}


def _spark_labels(spark, edges):
    df = spark.createDataFrame([(int(a), int(b)) for a, b in edges], "src long, dst long")
    labels, rounds = connected_components_star(df, "src", "dst")
    return {r["node"]: r["comp"] for r in labels.collect()}, rounds


def test_random_graphs_match_union_find(spark):
    rng = random.Random(42)
    for trial in range(3):
        n = 120
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(150)]
        edges = [(a, b) for a, b in edges if a != b]
        got, _ = _spark_labels(spark, edges)
        assert got == _union_find(edges), f"trial {trial}"


def test_two_cliques_one_bridge(spark):
    c1 = [(i, j) for i in range(0, 8) for j in range(i + 1, 8)]
    c2 = [(i, j) for i in range(100, 108) for j in range(i + 1, 108)]
    edges = c1 + c2 + [(7, 100)]
    got, _ = _spark_labels(spark, edges)
    expect = _union_find(edges)
    assert got == expect
    assert set(got.values()) == {0}  # one component, min id 0


def test_path_graph_logarithmic_rounds(spark):
    """256-node path: diameter 255. Min-label needs 255 sweeps; the star
    algorithm's O(log^2 n) bound must land far below that."""
    edges = [(i, i + 1) for i in range(255)]
    got, rounds = _spark_labels(spark, edges)
    assert got == {i: 0 for i in range(256)}
    assert rounds <= 14, f"path-256 took {rounds} rounds (min-label would take 255)"


def test_hub_star_and_broom(spark):
    """Skew shapes: a 200-leaf hub (one hot node carries the whole adjacency
    — the AQE skew-join case called out in graph.py) and a broom (128-path
    whose far end fans into 64 leaves — mixes the diameter and fan-out
    regimes in one component)."""
    hub = [(0, i) for i in range(1, 201)]
    got, rounds = _spark_labels(spark, hub)
    assert got == {i: 0 for i in range(201)}
    assert rounds <= 6, f"hub-200 took {rounds} rounds"

    broom = [(i, i + 1) for i in range(127)] + [(127, 1000 + j) for j in range(64)]
    got, rounds = _spark_labels(spark, broom)
    expect = _union_find(broom)
    assert got == expect
    assert set(got.values()) == {0}
    assert rounds <= 14, f"broom took {rounds} rounds"


@settings(max_examples=5, deadline=None)
@given(
    st.lists(  # a batch of small graphs, each a list of (u, v) edges
        st.lists(
            st.tuples(st.integers(0, 24), st.integers(0, 24)),
            min_size=1,
            max_size=50,
        ),
        min_size=1,
        max_size=4,
    )
)
def test_fuzzed_graph_batches_match_union_find(spark, graphs):
    """Hypothesis fuzz with shrinking: components of a disjoint union are
    independent, so each example offsets every generated graph into its own
    id range and runs ONE star-CC over the union (a Spark action per
    hypothesis example would be pathologically slow; one per batch is not).
    Self-loops are generated on purpose — the operator must drop them."""
    edges = []
    for g, glist in enumerate(graphs):
        base = g * 1000
        edges += [(base + a, base + b) for a, b in glist]
    clean = [(a, b) for a, b in edges if a != b]
    if not clean:
        return
    got, _ = _spark_labels(spark, edges)
    assert got == _union_find(clean)


def test_star_query_equals_minlabel_query(spark):
    import __spark_entry__ as e

    sf = "/root/testdata/sf0.001"
    a = e.queries()["dedup_cluster_components"](spark, sf)
    b = e.queries()["dedup_cluster_components_star"](spark, sf)
    rows_a = sorted((r["doc_id"], r["cluster_id"], r["is_keeper"]) for r in a.collect())
    rows_b = sorted((int(r["doc_id"]), int(r["cluster_id"]), r["is_keeper"]) for r in b.collect())
    assert rows_a == rows_b

"""Distributed connected components: the alternating large-star/small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC 2014 — public literature).

`dedup_cluster_components` (textops.py) uses iterative min-label propagation:
one shuffle per sweep but O(component diameter) sweeps — ideal for the
shallow template-family clusters near-dup dedup produces, degenerate on
adversarial high-diameter graphs (a path of 10^6 nodes needs 10^6 sweeps).
This module realizes the upgrade that was previously only documented: the
alternating star algorithm converges in O(log^2 n) rounds REGARDLESS of
diameter (tests/test_graph_cc.py pins a 256-node path converging in <=14
rounds where min-label would need 255 sweeps).

Per round, each star operation is one hash-aggregate (map-side combined: a
hot node's min collapses before the shuffle) plus one equi-join on the node
key; the join side carrying a hot node's adjacency is exactly the case AQE
skew-join splitting handles (enabled session-wide). Edge sets are
deduplicated and localCheckpointed per round to pin lineage, exactly like the
min-label loop.

Semantics: every node is labeled with the minimum node id of its component
(the same keeper rule as the reference's duplicate folding —
findMissingPages.py keeps the first-seen URL of each dup set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import register


def _star_round(e: DataFrame) -> DataFrame:
    """One large-star + small-star round over a directed edge set (u, v),
    u != v. Returns the new edge set, deduplicated."""
    # ---- large-star: for each node u, connect every strictly-larger
    # neighbor v to m(u) = min(N(u) + {u})
    adj = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m_lg = adj.groupBy("u").agg(F.min("v").alias("mv")).select(
        "u", F.least("mv", F.col("u")).alias("m")
    )
    e1 = (
        adj.join(m_lg, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    # ---- small-star: orient edges large->small; for each node u connect
    # every smaller neighbor (and u itself) to m(u) = min of those neighbors
    dirn = (
        e1.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    m_sm = dirn.groupBy("u").agg(F.min("v").alias("m"))
    with_m = dirn.join(m_sm, "u")
    out_nbr = (
        with_m.filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    out_self = with_m.select("u", F.col("m").alias("v"))
    return out_nbr.union(out_self).filter(F.col("u") != F.col("v")).distinct()


def connected_components_star(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_rounds: int = 64
) -> tuple[DataFrame, int]:
    """Label every node appearing in ``edges`` with the min node id of its
    connected component. Returns (labels DataFrame(node, comp), rounds run).

    Convergence: the edge set is a fixed point of the star operations exactly
    when the graph is a disjoint union of min-rooted stars; detected by
    (count, bit_xor-of-xxhash64) equality across rounds — one tiny aggregate
    over the checkpointed edge set (order-independent, overflow-free under
    ANSI mode), no full-set comparison join.
    """
    e = (
        edges.select(F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    nodes = e.select(F.col("u").alias("node")).union(e.select(F.col("v").alias("node"))).distinct()

    def _sig(df: DataFrame):
        row = df.select(F.xxhash64("u", "v").alias("h")).agg(
            F.count("*").alias("n"), F.expr("bit_xor(h)").alias("h")
        ).collect()[0]
        return (row["n"], row["h"])

    sig = _sig(e)
    rounds = 0
    for rounds in range(1, max_rounds + 1):
        e_next = _star_round(e).localCheckpoint()
        sig_next = _sig(e_next)
        e = e_next
        if sig_next == sig:
            break
        sig = sig_next
    # fixed point: every non-root node has exactly one edge (node -> root)
    labels = (
        nodes.join(e.withColumnRenamed("u", "node"), "node", "left")
        .select("node", F.coalesce("v", "node").alias("comp"))
    )
    return labels, rounds


def _star_oracle_sql() -> str:
    # identical answer to the min-label variant: reuse the recursive-CTE
    # connected-components oracle over the same LSH candidate pair list
    from .textops import _cluster_oracle_sql

    return _cluster_oracle_sql()


@register(
    "dedup_cluster_components_star",
    _star_oracle_sql(),
    "Connected components over the MinHash-LSH candidate graph via the "
    "alternating large-star/small-star algorithm (Kiveris et al. 2014) — "
    "O(log^2 n) rounds independent of component diameter, the scale upgrade "
    "to the min-label variant for adversarial graphs. Identical output "
    "contract (doc_id, min-id cluster_id, is_keeper) and identical DuckDB "
    "recursive-CTE oracle as dedup_cluster_components.",
)
def dedup_cluster_components_star(spark: SparkSession, sf: str) -> DataFrame:
    from .textops import _docs_view_parallel, _lsh_pairs_sql

    v = _docs_view_parallel(spark, sf)
    pairs = spark.sql(_lsh_pairs_sql("spark", v))
    labels, _ = connected_components_star(pairs, "doc_a", "doc_b")
    return labels.select(
        F.col("node").alias("doc_id"),
        F.col("comp").alias("cluster_id"),
        (F.col("node") == F.col("comp")).alias("is_keeper"),
    )

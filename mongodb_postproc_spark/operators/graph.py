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


# --------------------------------------------------------------------------
# PageRank: the second iterative graph primitive (beside connected
# components) a link-graph engine needs — the reference ranks nothing, but
# the crawl frontier it implies (findMissingPages.py builds the page link
# worklist) is exactly the host-graph PageRank operates on at web scale.
# --------------------------------------------------------------------------

PR_ITERS = 3  # fixed, unrolled in the oracle — same contract as KMEANS_ITERS
PR_SCALE = 1_000_000  # rank carried in integer micro-units
PR_SUPP_OFFSET = 10_000_000  # supplier node ids, disjoint from customer keys


def pagerank_fixed(
    edges: DataFrame, iters: int = PR_ITERS, assume_distinct: bool = False
) -> DataFrame:
    """Integer-exact damped PageRank, a fixed number of synchronous
    iterations over a directed edge list (src, dst).

    All rank state is BIGINT micro-units: each node starts at 10^6, a node
    with out-degree d sends ``r div d`` along each out-edge, and the damped
    update is ``0.15*10^6 + (85 * Σ inbound) div 100`` — integer div on both
    sides, so the result is order-free, partitioning-free and bit-identical
    on any engine (the a19_corr_exact determinism trick applied to an
    iterative algorithm; a float PageRank would drift with partition count).
    ``assume_distinct`` skips the defensive edge dedup (one full-edge
    shuffle) when the caller's construction already guarantees it.

    Scale shape: the (edge ⋈ out-degree) relation is computed ONCE and
    localCheckpointed — each iteration is then a single equi-join of the
    K-row rank vector on src plus one map-side-combined hash aggregate on
    dst (a hot host's inbound sum partially collapses before the shuffle;
    AQE skew splitting covers the rest). O(iters) shuffles total, no
    all-pairs stage, nothing driver-side. Every node here has an out-edge
    (callers pass symmetrized or pruned-dangling graphs), so no dangling
    mass term is needed.
    """
    e = edges.select(F.col("src").cast("long"), F.col("dst").cast("long")).filter(
        F.col("src") != F.col("dst")
    )
    if not assume_distinct:
        e = e.distinct()
    # pin the edge list BEFORE deriving degrees: deg and the ed join both
    # consume it, and without the checkpoint each re-runs the caller's
    # edge-construction plan (measured 2x the whole query's cost at sf0.1)
    e = e.localCheckpoint()
    deg = e.groupBy("src").agg(F.count("*").alias("d"))
    ed = e.join(deg, "src").localCheckpoint()
    r = deg.select(F.col("src").alias("node"), F.lit(PR_SCALE).cast("long").alias("r"))
    for _ in range(iters):
        r = (
            ed.join(r.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"), F.expr("r div d").alias("c"))
            .groupBy("node")
            .agg(F.expr(f"CAST({PR_SCALE * 15 // 100} + (85 * sum(c)) div 100 AS BIGINT)").alias("r"))
        )
    return r


def _pagerank_sql(d: str) -> str:
    """Unrolled-oracle twin of :func:`pagerank_fixed` over the order graph:
    customers and suppliers are nodes, each order line is an edge in BOTH
    directions (symmetrized, so the chain customer→supplier→customer mixes
    and no node dangles) — the bipartite analog of a host link graph."""
    div = "div" if d == "spark" else "//"
    teleport = PR_SCALE * 15 // 100
    ctes = [
        f"""edges AS (
          SELECT o.o_custkey AS src, l.l_suppkey + {PR_SUPP_OFFSET} AS dst
          FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
          UNION
          SELECT l.l_suppkey + {PR_SUPP_OFFSET} AS src, o.o_custkey AS dst
          FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey)""",
        "deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY src)",
        f"r0 AS (SELECT src AS node, CAST({PR_SCALE} AS BIGINT) AS r FROM deg)",
    ]
    prev = "r0"
    for i in range(1, PR_ITERS + 1):
        ctes.append(f"""it{i} AS (
          SELECT e.dst AS node,
                 CAST({teleport} + (85 * sum(r.r {div} d.d)) {div} 100 AS BIGINT) AS r
          FROM edges e
          JOIN deg d ON d.src = e.src
          JOIN {prev} r ON r.node = e.src
          GROUP BY e.dst)""")
        prev = f"it{i}"
    return f"""
        WITH {", ".join(ctes)},
        ranked AS (
          SELECT node, r AS rank_micro,
                 row_number() OVER (ORDER BY r DESC, node ASC) AS rk
          FROM {prev})
        SELECT node, rank_micro, rk FROM ranked WHERE rk <= 25
    """


def _triangle_sql(d: str, v: str, edge_sql: str | None = None) -> str:
    """Triangle participation counts over the MinHash-LSH candidate graph —
    the standard ordered-edge (compact-forwarding) enumeration: every edge
    is stored once as (a < b), and a triangle {a<b<c} is found exactly once
    as e1=(a,b) ⋈ e2=(b,c) ⋈ e3=(a,c). Work is Σ deg⁺(v)² over
    lower-endpoint out-degrees (never n³); on the LSH graph degrees are
    bounded by near-dup cluster sizes, and the two equi-joins shuffle on
    plain node keys (AQE splits a hot template-family's key). Each triangle
    credits all three corners; output is per-doc counts."""
    from .textops import _lsh_pairs_sql

    return f"""
        WITH e AS ({edge_sql or _lsh_pairs_sql(d, v)}),
        tri AS (
          SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c
          FROM e e1
          JOIN e e2 ON e2.doc_a = e1.doc_b
          JOIN e e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b),
        corners AS (
          SELECT a AS doc_id FROM tri
          UNION ALL SELECT b FROM tri
          UNION ALL SELECT c FROM tri)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_triangles
        FROM corners GROUP BY doc_id
    """


@register(
    "graph_triangle_count",
    _triangle_sql("duckdb", "documents"),
    "Per-node triangle counts over the MinHash-LSH candidate graph via "
    "ordered-edge compact forwarding (each triangle enumerated exactly once "
    "as (a<b)⋈(b<c)⋈(a<c)) — the clustering-coefficient/cohesion primitive "
    "complementing connected components and PageRank; work is Σ deg⁺² on "
    "ordered degrees, never n³, and both joins are plain node-key shuffles",
)
def graph_triangle_count(spark: SparkSession, sf: str) -> DataFrame:
    from .textops import _docs_view_parallel, _lsh_pairs_sql

    v = _docs_view_parallel(spark, sf)
    # the edge set is referenced three times by the triangle join: pin it
    # once (localCheckpoint) so the shingle->minhash->band stage runs once,
    # not three times — same materialization discipline as the CC loops
    spark.sql(_lsh_pairs_sql("spark", v)).localCheckpoint().createOrReplaceTempView(
        "v_tri_edges"
    )
    return spark.sql(
        _triangle_sql("spark", v, edge_sql="SELECT doc_a, doc_b FROM v_tri_edges")
    )


@register(
    "graph_pagerank",
    _pagerank_sql("duckdb"),
    f"Damped PageRank, {PR_ITERS} fixed synchronous iterations over the "
    "symmetrized customer↔supplier order graph (the host-link-graph shape at "
    "web scale): rank in BIGINT micro-units with integer div at every step, "
    "so the result is order-free and bit-identical on any engine/partitioning "
    "— the iterative-graph companion to connected components. Spark side is "
    "the reusable pagerank_fixed() DataFrame loop (edge⋈degree checkpointed "
    "once, one equi-join + one map-side-combined aggregate per iteration); "
    "oracle is the same arithmetic unrolled as CTEs",
)
def graph_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    from .base import load

    load(spark, sf, "orders").createOrReplaceTempView("v_pr_orders")
    load(spark, sf, "lineitem").createOrReplaceTempView("v_pr_lineitem")
    # one orders⋈lineitem pass: distinct (cust, supp) base, then both edge
    # directions by projection (direction sets are disjoint by the id
    # offset, so the symmetrized set needs no second dedup — the oracle's
    # UNION spells the same set declaratively)
    edges = spark.sql(f"""
        WITH base AS (
          SELECT DISTINCT o.o_custkey AS c, l.l_suppkey + {PR_SUPP_OFFSET} AS s
          FROM v_pr_orders o JOIN v_pr_lineitem l ON l.l_orderkey = o.o_orderkey)
        SELECT c AS src, s AS dst FROM base
        UNION ALL
        SELECT s AS src, c AS dst FROM base
    """)
    r = pagerank_fixed(edges, PR_ITERS, assume_distinct=True)
    top = r.orderBy(F.desc("r"), F.asc("node")).limit(25)
    # rank the 25-row result; pmod keeps WindowExec off the single-partition
    # warning path without changing the (global) ordering semantics
    from pyspark.sql import Window

    w = Window.partitionBy(F.pmod(F.col("node"), F.lit(1))).orderBy(
        F.desc("r"), F.asc("node")
    )
    return top.select(
        "node",
        F.col("r").alias("rank_micro"),
        F.row_number().over(w).alias("rk"),
    )

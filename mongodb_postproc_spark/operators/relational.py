"""Relational operator battery (SURVEY.md §2 inventory → Spark DataFrame API).

Each query cites the reference operator(s) it covers. The Spark side is
declarative DataFrame code — predicate pushdown, column pruning, join
selection, and partial aggregation all come from Catalyst/AQE; the oracle is
the same computation in ANSI SQL for DuckDB.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from .base import load, register

# --------------------------------------------------------------------------
# Scans / filters / projections (S2-S7, P1-P10)
# --------------------------------------------------------------------------


@register(
    "s2_filtered_scan",
    "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'O'",
    "S2 filtered scan + P1 projection (find({'$exists'}) analog; filter and "
    "column pruning push to the parquet scan)",
)
def s2_filtered_scan(spark: SparkSession, sf: str):
    return (
        load(spark, sf, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "s3_point_lookup",
    "SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey = 42",
    "S3 point lookup by key (find({'key': ...}), reference "
    "fix_incorrect_structures.py:239)",
)
def s3_point_lookup(spark: SparkSession, sf: str):
    return (
        load(spark, sf, "customer")
        .filter(F.col("c_custkey") == 42)
        .select("c_custkey", "c_name", "c_acctbal")
    )


@register(
    "s4_in_scan",
    "SELECT n_nationkey, n_name FROM nation WHERE n_nationkey IN (1, 3, 5, 7) "
    "ORDER BY n_nationkey",
    "S4 $in membership scan (findMissingPages-style key-set membership)",
)
def s4_in_scan(spark: SparkSession, sf: str):
    return (
        load(spark, sf, "nation")
        .filter(F.col("n_nationkey").isin(1, 3, 5, 7))
        .select("n_nationkey", "n_name")
        .orderBy("n_nationkey")
    )


@register(
    "s5_sorted_page",
    "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey "
    "LIMIT 20 OFFSET 100",
    "S5 sorted paginated scan — the reference's resume-from-checkpoint idiom "
    "(sort('_id').skip(d).limit(n), cifEditor.py:216)",
)
def s5_sorted_page(spark: SparkSession, sf: str):
    return (
        load(spark, sf, "orders")
        .orderBy("o_orderkey")
        .offset(100)
        .limit(20)
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "s6_distinct_projection",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "S6 distinct key projection (db[...].distinct('key'))",
)
def s6_distinct(spark: SparkSession, sf: str):
    return load(spark, sf, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@register(
    "s7_count",
    "SELECT count(*) AS n_rows FROM lineitem",
    "S7 collection count",
)
def s7_count(spark: SparkSession, sf: str):
    return load(spark, sf, "lineitem").agg(F.count("*").alias("n_rows"))


@register(
    "p2_substring_predicate",
    "SELECT p_partkey, p_name FROM part WHERE p_name LIKE '%red%'",
    "P2 substring predicate (' hp' in title, analysePauling.py:64)",
)
def p2_substring(spark: SparkSession, sf: str):
    return (
        load(spark, sf, "part")
        .filter(F.col("p_name").contains("red"))
        .select("p_partkey", "p_name")
    )


@register(
    "p3_regex_predicate",
    "SELECT doc_id FROM documents WHERE regexp_matches(text, 'merge (batch|row)')",
    "P3 regex predicate (re.findall-as-filter, exp_t_check.py:58)",
)
def p3_regex(spark: SparkSession, sf: str):
    return (
        load(spark, sf, "documents")
        .filter(F.col("text").rlike("merge (batch|row)"))
        .select("doc_id")
    )


@register(
    "p5_tristate_boolean",
    """
    WITH tagged AS (
      SELECT event_type,
             CASE WHEN value > 75 THEN TRUE
                  WHEN value < 25 THEN FALSE
                  ELSE NULL END AS is_big
      FROM events)
    SELECT event_type, count(*) AS n
    FROM tagged WHERE is_big = FALSE OR is_big IS NULL
    GROUP BY event_type
    """,
    "P5 tri-state boolean with Python `in [False, None]` semantics "
    "(analysePauling.py:103-113) — NULL participates via explicit IS NULL",
)
def p5_tristate(spark: SparkSession, sf: str):
    ev = load(spark, sf, "events").withColumn(
        "is_big",
        F.when(F.col("value") > 75, F.lit(True))
        .when(F.col("value") < 25, F.lit(False))
        .otherwise(F.lit(None).cast("boolean")),
    )
    return (
        ev.filter((F.col("is_big") == False) | F.col("is_big").isNull())  # noqa: E712
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )


@register(
    "p6_range_banding",
    """
    SELECT CASE WHEN l_quantity < 10 THEN 'low'
                WHEN l_quantity < 30 THEN 'mid'
                ELSE 'high' END AS band,
           count(*) AS n, round(sum(l_extendedprice), 2) AS total_price
    FROM lineitem WHERE l_shipdate BETWEEN TIMESTAMP '1994-01-01' AND TIMESTAMP '1996-12-31'
    GROUP BY band
    """,
    "P6 numeric range predicate + cutoff banding (analysePauling.py:281-304)",
)
def p6_banding(spark: SparkSession, sf: str):
    li = load(spark, sf, "lineitem").filter(
        F.col("l_shipdate").between("1994-01-01", "1996-12-31 23:59:59.999999")
    )
    band = (
        F.when(F.col("l_quantity") < 10, "low")
        .when(F.col("l_quantity") < 30, "mid")
        .otherwise("high")
    )
    return (
        li.withColumn("band", band)
        .groupBy("band")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("total_price"))
    )


@register(
    "p7_blacklist_antifilter",
    "SELECT count(*) AS n FROM customer WHERE c_custkey NOT IN (1, 2, 3, 500)",
    "P7 anti-filter by key blacklist (compositionMatcher.py:39)",
)
def p7_blacklist(spark: SparkSession, sf: str):
    return (
        load(spark, sf, "customer")
        .filter(~F.col("c_custkey").isin(1, 2, 3, 500))
        .agg(F.count("*").alias("n"))
    )


@register(
    "p10_conditional_routing",
    """
    SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN o_orderpriority ELSE 'other' END AS routed,
           count(*) AS n
    FROM orders GROUP BY routed
    """,
    "P10 conditional field routing (Refined-vs-Alphabetic formula fallback, "
    "compositionMatcher.py:44-47)",
)
def p10_routing(spark: SparkSession, sf: str):
    o = load(spark, sf, "orders")
    routed = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), F.col("o_orderpriority")
    ).otherwise(F.lit("other"))
    return o.withColumn("routed", routed).groupBy("routed").agg(F.count("*").alias("n"))


# --------------------------------------------------------------------------
# Joins (J1-J6)
# --------------------------------------------------------------------------


@register(
    "j1_paired_self_join",
    """
    WITH lo AS (SELECT l_partkey, round(sum(l_extendedprice), 2) AS sum_lo,
                       count(*) AS n_lo
                FROM lineitem WHERE l_returnflag = 'A' GROUP BY l_partkey),
         hi AS (SELECT l_partkey, round(sum(l_extendedprice), 2) AS sum_hi,
                       count(*) AS n_hi
                FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_partkey)
    SELECT lo.l_partkey AS partkey, sum_lo, n_lo, sum_hi, n_hi
    FROM lo JOIN hi ON lo.l_partkey = hi.l_partkey
    """,
    "J1 paired-group equi self-join (ground/excited merge, "
    "analysePauling.py:201-202) — group split A2 feeding the join",
)
def j1_self_join(spark: SparkSession, sf: str):
    li = load(spark, sf, "lineitem")
    lo = (
        li.filter(F.col("l_returnflag") == "A")
        .groupBy("l_partkey")
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("sum_lo"),
            F.count("*").alias("n_lo"),
        )
    )
    hi = (
        li.filter(F.col("l_returnflag") == "R")
        .groupBy("l_partkey")
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("sum_hi"),
            F.count("*").alias("n_hi"),
        )
    )
    return lo.join(hi, "l_partkey").select(
        F.col("l_partkey").alias("partkey"), "sum_lo", "n_lo", "sum_hi", "n_hi"
    )


@register(
    "j2_star_join_agg",
    """
    SELECT n_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
                JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    "J2 multi-table equi join + aggregation (pd.merge at "
    "analysePauling.py:392); dims broadcast by Catalyst",
)
def j2_star_join(spark: SparkSession, sf: str):
    o = load(spark, sf, "orders")
    c = load(spark, sf, "customer")
    n = load(spark, sf, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


@register(
    "j3_semi_intersection",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    "J3 set intersection / semi-join (comps_true ∩ comps_false driving the "
    "*_dataset flags, analysePauling.py:115-121)",
)
def j3_intersect(spark: SparkSession, sf: str):
    o = load(spark, sf, "orders")
    open_ = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    full = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_.intersect(full)


@register(
    "j4_broadcast_worklist_lookup",
    """
    WITH work AS (SELECT c_custkey FROM customer
                  ORDER BY c_acctbal DESC, c_custkey LIMIT 20)
    SELECT w.c_custkey AS custkey, count(o_orderkey) AS n_orders
    FROM work w LEFT JOIN orders ON o_custkey = w.c_custkey
    GROUP BY w.c_custkey
    """,
    "J4 key-driven worklist lookup — small worklist broadcast against the "
    "big table (incorrect_structs → pauling_file, "
    "fix_incorrect_structures.py:235-240)",
)
def j4_worklist(spark: SparkSession, sf: str):
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    work = c.orderBy(F.desc("c_acctbal"), "c_custkey").limit(20).select("c_custkey")
    return (
        F.broadcast(work)
        .join(o, work.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .select(F.col("c_custkey").alias("custkey"), "n_orders")
    )


@register(
    "j5_anti_join_missing",
    """
    SELECT c_custkey FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "J5 set difference / anti-join — the URL-seen-set gap check "
    "(set(y)-set(x), findMissingPages.py:38-44)",
)
def j5_anti(spark: SparkSession, sf: str):
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey")


@register(
    "j6_duplicate_detection",
    """
    SELECT o_custkey, count(*) AS n_orders FROM orders
    GROUP BY o_custkey HAVING count(*) > 10
    """,
    "J6 duplicate-key detection (findMissingkeys.py:10-17 — the quadratic "
    "python loop becomes one hash aggregate)",
)
def j6_dups(spark: SparkSession, sf: str):
    return (
        load(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") > 10)
    )


# --------------------------------------------------------------------------
# Aggregations (A1-A15)
# --------------------------------------------------------------------------


@register(
    "a1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                       AS sum_qty,
           round(sum(l_extendedprice), 2)                                  AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)               AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4)                                       AS avg_qty,
           round(avg(l_extendedprice), 4)                                  AS avg_price,
           round(avg(l_discount), 4)                                       AS avg_disc,
           count(*)                                                        AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    "A1 multi-key group-by with a full agg battery (TPC-H Q1 shape; "
    "df.groupby(...).mean() at analysePauling.py:192) — FLAGSHIP",
)
def a1_pricing_summary(spark: SparkSession, sf: str):
    li = load(spark, sf, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "a3_group_count",
    "SELECT event_type, count(*) AS n FROM events GROUP BY event_type",
    "A3 group-by count (CN_barchart.py:45)",
)
def a3_group_count(spark: SparkSession, sf: str):
    return load(spark, sf, "events").groupBy("event_type").agg(F.count("*").alias("n"))


@register(
    "a5_bucketized_histogram",
    """
    SELECT CAST(floor(value / 10) AS INT) AS bucket, count(*) AS n
    FROM events GROUP BY bucket ORDER BY bucket
    """,
    "A5 bucketized histogram (pd.cut at CN_barchart.py:43-45)",
)
def a5_histogram(spark: SparkSession, sf: str):
    return (
        load(spark, sf, "events")
        .withColumn("bucket", F.floor(F.col("value") / 10).cast("int"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .orderBy("bucket")
    )


def mode_per_group(df, key: str, val: str):
    """scipy.stats.mode semantics per group: the most frequent value, ties
    broken by the LOWEST value (getCoordination.py:30-42 ``mode(...)[0][0]``).
    Returns (key, mode_<val>, mode_count)."""
    counted = df.groupBy(key, val).agg(F.count("*").alias("cnt"))
    w = Window.partitionBy(key).orderBy(F.desc("cnt"), F.asc(val))
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(key, F.col(val).alias(f"mode_{val}"), F.col("cnt").alias("mode_count"))
    )


@register(
    "a7_mode_per_group",
    """
    WITH counted AS (
      SELECT l_returnflag, l_quantity, count(*) AS cnt FROM lineitem
      GROUP BY l_returnflag, l_quantity),
    ranked AS (
      SELECT l_returnflag, l_quantity, cnt,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY cnt DESC, l_quantity ASC) AS rn
      FROM counted)
    SELECT l_returnflag, l_quantity AS mode_qty, cnt AS mode_count
    FROM ranked WHERE rn = 1
    """,
    "A7 mode-per-key with the scipy tie-break (lowest value wins, "
    "getCoordination.py:30-42)",
)
def a7_mode(spark: SparkSession, sf: str):
    li = load(spark, sf, "lineitem")
    return mode_per_group(li, "l_returnflag", "l_quantity").select(
        "l_returnflag",
        F.col("mode_l_quantity").alias("mode_qty"),
        "mode_count",
    )


@register(
    "a8_weighted_average",
    """
    SELECT l_returnflag,
           round(sum(l_quantity * l_extendedprice) / sum(l_quantity), 4) AS w_avg_price
    FROM lineitem GROUP BY l_returnflag
    """,
    "A8 weighted average (cation-weighted CN, getCoordination.py:45-70)",
)
def a8_weighted_avg(spark: SparkSession, sf: str):
    return (
        load(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(
                F.sum(F.col("l_quantity") * F.col("l_extendedprice")) / F.sum("l_quantity"), 4
            ).alias("w_avg_price")
        )
    )


@register(
    "a9_hoppe_exponential_weights",
    """
    WITH b AS (
      SELECT l_orderkey, l_extendedprice,
             min(l_extendedprice) OVER (PARTITION BY l_orderkey) AS l_min
      FROM lineitem WHERE l_orderkey < 1000)
    SELECT l_orderkey,
           round(sum(exp(1 - pow(l_extendedprice / l_min, 6))), 6) AS econ
    FROM b GROUP BY l_orderkey
    """,
    "A9 Hoppe ECoN exponential weighting — min-over-partition window then "
    "exp/pow aggregate (getCoordination.py:100-114,137-162)",
)
def a9_hoppe(spark: SparkSession, sf: str):
    li = load(spark, sf, "lineitem").filter(F.col("l_orderkey") < 1000)
    w = Window.partitionBy("l_orderkey")
    b = li.withColumn("l_min", F.min("l_extendedprice").over(w))
    weight = F.exp(1 - F.pow(F.col("l_extendedprice") / F.col("l_min"), 6))
    return b.groupBy("l_orderkey").agg(F.round(F.sum(weight), 6).alias("econ"))


def econ_two_stage(df, key: str, bond: str):
    """Full Hoppe (1979) two-stage ECoN, the exact math of the reference's
    EffectiveCoordFinder (getCoordination.py:100-114 calculate_weighted_avg,
    :117-162 get_cns): stage 1 computes the weighted-average bond length
    l_av = sum(l*exp(1-(l/l_min)^6)) / sum(exp(1-(l/l_min)^6)); stage 2
    re-weights each bond against l_av and sums the per-bond weights, each
    rounded to 3 decimals as the reference does (getCoordination.py:159).
    All window + aggregate expressions — one shuffle on the group key."""
    w = Window.partitionBy(key)
    l_min = F.min(bond).over(w)
    w1 = F.exp(1 - F.pow(F.col(bond) / l_min, 6))
    l_av = F.sum(F.col(bond) * w1).over(w) / F.sum(w1).over(w)
    wt = F.round(F.exp(1 - F.pow(F.col(bond) / l_av, 6)), 3)
    return (
        df.withColumn("_w", wt)
        .groupBy(key)
        .agg(F.round(F.sum("_w"), 6).alias("econ2"))
    )


@register(
    "a9b_econ_two_stage",
    """
    WITH b AS (
      SELECT l_orderkey, l_extendedprice,
             min(l_extendedprice) OVER (PARTITION BY l_orderkey) AS l_min
      FROM lineitem WHERE l_orderkey < 1000),
    c AS (
      SELECT l_orderkey, l_extendedprice,
             sum(l_extendedprice * exp(1 - pow(l_extendedprice / l_min, 6)))
               OVER (PARTITION BY l_orderkey)
             / sum(exp(1 - pow(l_extendedprice / l_min, 6)))
               OVER (PARTITION BY l_orderkey) AS l_av
      FROM b)
    SELECT l_orderkey,
           round(sum(round(exp(1 - pow(l_extendedprice / l_av, 6)), 3)), 6) AS econ2
    FROM c GROUP BY l_orderkey
    """,
    "A9b full two-stage Hoppe ECoN — weighted-average bond length then "
    "re-weighted sum with 3-decimal per-bond rounding, the exact "
    "EffectiveCoordFinder math (getCoordination.py:100-114,117-162; A9 "
    "covers the single-stage l_min form)",
)
def a9b_econ_two_stage(spark: SparkSession, sf: str):
    li = load(spark, sf, "lineitem").filter(F.col("l_orderkey") < 1000)
    return econ_two_stage(li, "l_orderkey", "l_extendedprice")


@register(
    "a17_okeeffe_cn",
    """
    WITH f AS (
      SELECT l.l_orderkey, l.l_quantity, l.l_extendedprice
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_orderkey < 1000 AND o.o_orderstatus = 'F'),
    b AS (
      SELECT l_orderkey, l_quantity, l_extendedprice,
             max(l_extendedprice) OVER (PARTITION BY l_orderkey) AS l_max
      FROM f),
    cn AS (
      SELECT l_orderkey,
             round(sum(l_extendedprice / l_max), 6) AS okeeffe_cn,
             round(sum(l_quantity * l_extendedprice / l_max) / sum(l_quantity), 6)
               AS okeeffe_wavg
      FROM b GROUP BY l_orderkey)
    SELECT l_orderkey, okeeffe_cn, okeeffe_wavg,
           CASE WHEN okeeffe_cn > 2 AND okeeffe_cn < 4 THEN 'y'
                WHEN okeeffe_cn >= 4 AND okeeffe_cn < 6 THEN 'g'
                WHEN okeeffe_cn >= 6 AND okeeffe_cn < 8 THEN 'b'
                WHEN okeeffe_cn >= 8 AND okeeffe_cn < 10 THEN 'r'
                WHEN okeeffe_cn >= 10 AND okeeffe_cn < 12 THEN 'c'
                ELSE 'k' END AS coord_band
    FROM cn
    """,
    "A17 O'Keeffe max-normalized CN — the third coordination-number variant "
    "the reference computes alongside Hoppe ECoN (A9) and Voronoi threshold "
    "(A10): neighbor weights normalized by the group max (O'Keeffe 1979 "
    "largest-solid-angle normalization), summed to a CN, gated per group "
    "(analysePauling.py:179 gates on is_ordered), weighted-averaged "
    "(analysePauling.py:186 get_cation_weighted_avg) and banded into the "
    "color classes of the coordination() descriptor "
    "(analysePauling.py:344-359, CN_barchart.py:11)",
)
def a17_okeeffe_cn(spark: SparkSession, sf: str):
    # the is_ordered gate analog is a per-group attribute from the parent
    # table; broadcast the filtered key list (small dim at any scale factor)
    gate = (
        load(spark, sf, "orders")
        .filter((F.col("o_orderkey") < 1000) & (F.col("o_orderstatus") == "F"))
        .select("o_orderkey")
    )
    li = load(spark, sf, "lineitem").filter(F.col("l_orderkey") < 1000)
    f = li.join(F.broadcast(gate), li.l_orderkey == gate.o_orderkey).drop("o_orderkey")
    w = Window.partitionBy("l_orderkey")
    b = f.withColumn("l_max", F.max("l_extendedprice").over(w))
    weight = F.col("l_extendedprice") / F.col("l_max")
    cn = b.groupBy("l_orderkey").agg(
        F.round(F.sum(weight), 6).alias("okeeffe_cn"),
        F.round(
            F.sum(F.col("l_quantity") * weight) / F.sum("l_quantity"), 6
        ).alias("okeeffe_wavg"),
    )
    c = F.col("okeeffe_cn")
    band = (
        F.when((c > 2) & (c < 4), "y")
        .when((c >= 4) & (c < 6), "g")
        .when((c >= 6) & (c < 8), "b")
        .when((c >= 8) & (c < 10), "r")
        .when((c >= 10) & (c < 12), "c")
        .otherwise("k")
    )
    return cn.select("l_orderkey", "okeeffe_cn", "okeeffe_wavg", band.alias("coord_band"))


@register(
    "a11_conditional_counters",
    """
    SELECT count(*) AS total,
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
           CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
           CAST(sum(CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
           CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
                     AND o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent_f
    FROM orders
    """,
    "A11 conditional counters — one pass replaces the whole counting loop "
    "(compositionMatcher.py:31-36,88-94)",
)
def a11_counters(spark: SparkSession, sf: str):
    o = load(spark, sf, "orders")
    c = lambda cond: F.sum(F.when(cond, 1).otherwise(0))  # noqa: E731
    return o.agg(
        F.count("*").alias("total"),
        c(F.col("o_orderstatus") == "F").alias("n_f"),
        c(F.col("o_orderstatus") == "O").alias("n_o"),
        c(F.col("o_totalprice") > 100000).alias("n_big"),
        c((F.col("o_orderpriority") == "1-URGENT") & (F.col("o_orderstatus") == "F")).alias(
            "n_urgent_f"
        ),
    )


@register(
    "a12_summary_stats",
    """
    SELECT count(value) AS n, round(avg(value), 4) AS mean,
           round(stddev_samp(value), 4) AS std,
           round(min(value), 4) AS min_v, round(max(value), 4) AS max_v
    FROM events
    """,
    "A12 summary statistics (df.describe(), analysePauling.py:441)",
)
def a12_summary(spark: SparkSession, sf: str):
    return load(spark, sf, "events").agg(
        F.count("value").alias("n"),
        F.round(F.avg("value"), 4).alias("mean"),
        F.round(F.stddev_samp("value"), 4).alias("std"),
        F.round(F.min("value"), 4).alias("min_v"),
        F.round(F.max("value"), 4).alias("max_v"),
    )


@register(
    "a14_set_accumulate_by_key",
    """
    SELECT o_orderpriority,
           string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
           count(DISTINCT o_custkey) AS n_custs
    FROM orders GROUP BY o_orderpriority
    """,
    "A14 set-accumulate by key (defaultdict(list) accumulation, "
    "analysePauling.py:95-114) — sorted join for deterministic comparison",
)
def a14_set_accumulate(spark: SparkSession, sf: str):
    return (
        load(spark, sf, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.array_join(F.array_sort(F.collect_set("o_orderstatus")), ",").alias("statuses"),
            F.countDistinct("o_custkey").alias("n_custs"),
        )
    )


@register(
    "a15_pivot",
    """
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END), 2) AS qty_o,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END), 2) AS qty_f
    FROM lineitem GROUP BY l_returnflag
    """,
    "A15 pivot / transpose (CN_heatmap.py:52)",
)
def a15_pivot(spark: SparkSession, sf: str):
    return (
        load(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .withColumnsRenamed({"O": "qty_o", "F": "qty_f"})
        .na.fill({"qty_o": 0.0, "qty_f": 0.0})
    )


# --------------------------------------------------------------------------
# Windows / sorts / top-k (W1-W5)
# --------------------------------------------------------------------------


@register(
    "w1_global_topk",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50
    """,
    "W1 global sort + top-k (sort_values().tail(50), analysePauling.py:378); "
    "Spark executes as TakeOrderedAndProject — no full sort",
)
def w1_topk(spark: SparkSession, sf: str):
    return (
        load(spark, sf, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(50)
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "w2_multikey_mixed_sort",
    """
    SELECT p_partkey, p_size, p_retailprice FROM part
    ORDER BY p_size DESC, p_retailprice ASC, p_partkey ASC LIMIT 100
    """,
    "W2 multi-key mixed-direction sort (analysePauling.py:399)",
)
def w2_mixed_sort(spark: SparkSession, sf: str):
    return (
        load(spark, sf, "part")
        .orderBy(F.desc("p_size"), F.asc("p_retailprice"), F.asc("p_partkey"))
        .limit(100)
        .select("p_partkey", "p_size", "p_retailprice")
    )


@register(
    "w5_politeness_slotting",
    """
    WITH ranked AS (
      SELECT event_id, user_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events)
    SELECT event_id, user_id, rn, (rn - 1) * 100 AS slot_ms
    FROM ranked WHERE rn <= 5
    """,
    "W5 the politeness window — rank over (key, time) × delay, the crawl "
    "scheduler's core (engine.py run_round); host=user_id analog",
)
def w5_politeness(spark: SparkSession, sf: str):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        load(spark, sf, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("event_id", "user_id", "rn", ((F.col("rn") - 1) * 100).alias("slot_ms"))
    )


# --------------------------------------------------------------------------
# Set operations (SO1-SO4)
# --------------------------------------------------------------------------


@register(
    "so1_intersect_users",
    """
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
    "SO1 INTERSECT (analysePauling.py:115)",
)
def so1_intersect(spark: SparkSession, sf: str):
    ev = load(spark, sf, "events")
    a = ev.filter(F.col("event_type") == "click").select("user_id")
    b = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return a.intersect(b)


@register(
    "so2_except_users",
    """
    SELECT user_id FROM events WHERE event_type = 'view'
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
    "SO2 EXCEPT / set difference (findMissingPages.py:42)",
)
def so2_except(spark: SparkSession, sf: str):
    ev = load(spark, sf, "events")
    a = ev.filter(F.col("event_type") == "view").select("user_id")
    b = ev.filter(F.col("event_type") == "error").select("user_id")
    return a.subtract(b)  # EXCEPT DISTINCT (set semantics, like the SQL)


@register(
    "so3_union_distinct",
    """
    SELECT user_id FROM events WHERE event_type = 'signup'
    UNION
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
    "SO3 UNION with dedup (set.add accumulation, findMissingkeys.py:10-17)",
)
def so3_union(spark: SparkSession, sf: str):
    ev = load(spark, sf, "events")
    a = ev.filter(F.col("event_type") == "signup").select("user_id")
    b = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return a.union(b).distinct()


@register(
    "so4_union_all_concat",
    """
    SELECT 'open' AS src, o_orderkey AS k FROM orders WHERE o_orderstatus = 'O'
    UNION ALL
    SELECT 'done' AS src, o_orderkey AS k FROM orders WHERE o_orderstatus = 'F'
    """,
    "SO4 UNION ALL concat (pd.concat, CN_barchart.py:46)",
)
def so4_union_all(spark: SparkSession, sf: str):
    o = load(spark, sf, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select(
        F.lit("open").alias("src"), F.col("o_orderkey").alias("k")
    )
    b = o.filter(F.col("o_orderstatus") == "F").select(
        F.lit("done").alias("src"), F.col("o_orderkey").alias("k")
    )
    return a.unionByName(b)

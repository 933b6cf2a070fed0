"""Scalar-function battery (SURVEY.md §2.7 F1-F19) over the testdata tables."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import load, register


@register(
    "f1_f3_regex_extract_strip",
    """
    SELECT doc_id,
           coalesce(nullif(regexp_extract(text, 'value ([a-z]+)', 1), ''), 'NONE') AS next_word,
           regexp_replace(text, 'table [a-z]+ ?', '', 'g') AS stripped_prefix
    FROM documents WHERE doc_id < 20
    """,
    "F1/F2 regex extract + F3 regex strip (p = X GPa extraction, "
    "analysePauling.py:54-55; bracket stripping cifEditor.py:159)",
)
def f1_regex(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents").filter(F.col("doc_id") < 20)
    return d.select(
        "doc_id",
        F.coalesce(
            F.nullif(F.regexp_extract("text", r"value ([a-z]+)", 1), F.lit("")), F.lit("NONE")
        ).alias("next_word"),
        F.regexp_replace("text", r"table [a-z]+ ?", "").alias("stripped_prefix"),
    )


@register(
    "f4_regexp_extract_all",
    """
    SELECT doc_id, len(regexp_extract_all(text, '[a-z]*key[a-z]*')) AS n_key_tokens
    FROM documents
    """,
    "F4 regex tokenize-all (re.findall element tokenizer, "
    "getCoordination.py:52)",
)
def f4_extract_all(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(r"[a-z]*key[a-z]*"), 0)).alias("n_key_tokens"),
    )


@register(
    "f6_try_cast_json",
    """
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
    "F6 cast-with-failure-null + F16 JSON decode (json.loads of map cols, "
    "CN_barchart.py:30; float() guard analysePauling.py:137-142)",
)
def f6_json_cast(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events")
    return (
        e.withColumn("k_val", F.get_json_object("props", "$.k").try_cast("bigint"))
        .groupBy("event_type")
        .agg(F.sum("k_val").alias("sum_k"), F.count("*").alias("n"))
    )


@register(
    "f7_split_part",
    """
    SELECT split_part(o_orderpriority, '-', 2) AS priority_word, count(*) AS n
    FROM orders GROUP BY priority_word
    """,
    "F7 split + element_at (Density.split()[2], analysePauling.py:141)",
)
def f7_split(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    return (
        o.withColumn("priority_word", F.split_part("o_orderpriority", F.lit("-"), F.lit(2)))
        .groupBy("priority_word")
        .agg(F.count("*").alias("n"))
    )


@register(
    "f9_f10_slice_concat",
    """
    SELECT p_partkey,
           substr(p_name, 1, 4) AS head4,
           substr(p_name, length(p_name) - 2, 3) AS tail3,
           p_brand || ':' || p_type AS brand_type
    FROM part WHERE p_partkey <= 100
    """,
    "F9 substring slice (link[-10:], findMissingPages.py:33) + F10 concat",
)
def f9_slice(spark: SparkSession, sf: str) -> DataFrame:
    p = load(spark, sf, "part").filter(F.col("p_partkey") <= 100)
    return p.select(
        "p_partkey",
        F.substring("p_name", 1, 4).alias("head4"),
        F.expr("substr(p_name, length(p_name) - 2, 3)").alias("tail3"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
    )


@register(
    "f11_f12_predicates_splitlines",
    """
    WITH lines AS (
      SELECT doc_id, unnest(regexp_split_to_array(text, ' the ')) AS segment
      FROM documents WHERE doc_id < 10)
    SELECT doc_id, count(*) AS n_segments,
           CAST(sum(CASE WHEN segment LIKE 'value%' THEN 1 ELSE 0 END) AS BIGINT) AS n_value_led
    FROM lines GROUP BY doc_id
    """,
    "F11 startswith/contains + F12 splitlines-and-explode "
    "(cif_string.splitlines(), cifEditor.py:95)",
)
def f11_split_explode(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents").filter(F.col("doc_id") < 10)
    seg = d.select("doc_id", F.explode(F.split("text", " the ")).alias("segment"))
    return seg.groupBy("doc_id").agg(
        F.count("*").alias("n_segments"),
        F.sum(F.when(F.col("segment").startswith("value"), 1).otherwise(0)).alias("n_value_led"),
    )


@register(
    "f13_value_remap",
    """
    SELECT CASE event_type WHEN 'purchase' THEN 'revenue'
                           WHEN 'click' THEN 'engagement'
                           WHEN 'view' THEN 'engagement'
                           ELSE 'ops' END AS category,
           count(*) AS n, round(sum(value), 2) AS total_value
    FROM events GROUP BY category
    """,
    "F13 value remap ({True:'HP', False:'LP'}.map, analysePauling.py:210)",
)
def f13_remap(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events")
    cat = (
        F.when(F.col("event_type") == "purchase", "revenue")
        .when(F.col("event_type").isin("click", "view"), "engagement")
        .otherwise("ops")
    )
    return (
        e.withColumn("category", cat)
        .groupBy("category")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )


@register(
    "f14_arithmetic_null_guard",
    """
    SELECT l_returnflag,
           round(avg(l_extendedprice / nullif(l_quantity, 0)), 4) AS avg_unit_price,
           round(avg(1.0 / nullif(l_discount, 0)), 4) AS avg_inv_discount
    FROM lineitem GROUP BY l_returnflag
    """,
    "F14 arithmetic with ZeroDivision guard (num_atoms/volume + "
    "except-skip, analysePauling.py:146-149,375)",
)
def f14_arith(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.avg(F.col("l_extendedprice") / F.nullif(F.col("l_quantity"), F.lit(0))), 4).alias(
            "avg_unit_price"
        ),
        F.round(F.avg(F.lit(1.0) / F.nullif(F.col("l_discount"), F.lit(0))), 4).alias(
            "avg_inv_discount"
        ),
    )


@register(
    "f15_math_battery",
    """
    SELECT l_linestatus,
           round(sum(exp(1 - pow(l_discount + 1.0, 2))), 4) AS exp_sum,
           round(max(pow(l_quantity, 0.5)), 4) AS max_sqrt_qty,
           min(round(l_extendedprice, -2)) AS min_rounded_price
    FROM lineitem GROUP BY l_linestatus
    """,
    "F15 exp/pow/min/max/round (Hoppe math, getCoordination.py:108-161)",
)
def f15_math(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.round(F.sum(F.exp(1 - F.pow(F.col("l_discount") + 1.0, 2))), 4).alias("exp_sum"),
        F.round(F.max(F.pow("l_quantity", F.lit(0.5))), 4).alias("max_sqrt_qty"),
        F.min(F.round("l_extendedprice", -2)).alias("min_rounded_price"),
    )


@register(
    "f17_f18_sorted_distinct_arrays",
    """
    WITH toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
      FROM documents WHERE doc_id < 15)
    SELECT doc_id,
           count(DISTINCT tok) AS n_distinct_tokens,
           string_agg(DISTINCT tok, '-' ORDER BY tok) AS token_sig
    FROM toks GROUP BY doc_id
    """,
    "F17 sorted-distinct-join ('-'.join(sorted(set(symbols))), "
    "compositionMatcher.py:16-24) + F18 array length",
)
def f17_sorted_distinct(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents").filter(F.col("doc_id") < 15)
    toks = d.select("doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"))
    return toks.groupBy("doc_id").agg(
        F.countDistinct("tok").alias("n_distinct_tokens"),
        F.array_join(F.array_sort(F.collect_set("tok")), "-").alias("token_sig"),
    )


@register(
    "f19_tolerance_equality",
    """
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE a.label = b.label
      AND abs(a.embedding[1]::DOUBLE - b.embedding[1]::DOUBLE) <= 0.01
      AND abs(a.embedding[2]::DOUBLE - b.embedding[2]::DOUBLE) <= 0.01
    """,
    "F19 tolerance equality (frac1.almost_equals(frac2, tol), "
    "compositionMatcher.py:60) — elementwise |a-b|<=tol join",
)
def f19_tolerance(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "embeddings")
    a = e.alias("a")
    b = e.alias("b")
    e1 = lambda side, i: F.element_at(F.col(f"{side}.embedding"), i).cast("double")  # noqa: E731
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .filter(
            (F.col("a.label") == F.col("b.label"))
            & (F.abs(e1("a", 1) - e1("b", 1)) <= 0.01)
            & (F.abs(e1("a", 2) - e1("b", 2)) <= 0.01)
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
    )

"""Bucketed co-located join: pre-bucketing both fact tables on the join key
removes the per-query shuffle entirely.

This is the storage-layout lever the 100 TB plan leans on (SURVEY §6 /
BASELINE scale notes): orders⋈lineitem on orderkey is the hottest join in
the battery, and at target scale re-shuffling 10^10 lineitem rows per query
dwarfs the join itself. Writing both sides bucketed by the join key into
the warehouse (Iceberg bucket-partition transform / Hive bucketBy — same
property) lets every subsequent join read co-located buckets: the finalized
physical plan must contain NO Exchange on either side, while the result
stays byte-identical to the shuffled join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mongodb_postproc_spark.operators.base import load

SF_DIR = "/root/testdata/sf0.001"
N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    load(spark, SF_DIR, "orders").write.bucketBy(N_BUCKETS, "o_orderkey").sortBy(
        "o_orderkey"
    ).mode("overwrite").saveAsTable("b_orders")
    load(spark, SF_DIR, "lineitem").write.bucketBy(N_BUCKETS, "l_orderkey").sortBy(
        "l_orderkey"
    ).mode("overwrite").saveAsTable("b_lineitem")
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def _joined(spark, orders, lineitem):
    return (
        spark.table(orders)
        .join(spark.table(lineitem), F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
    )


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    # broadcast would bypass bucketing; force the sort-merge path so the
    # plan proves co-location, as it would at 10^10 rows where neither
    # side broadcasts
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = _joined(spark, *bucketed_tables)
        df.count()  # finalize AdaptiveSparkPlan
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    join_section = plan.split("Aggregate")[0]
    assert "SortMergeJoin" in plan
    assert "Exchange" not in join_section, f"bucketed join still shuffles:\n{plan[:2500]}"


def test_bucketed_result_matches_shuffled(spark, bucketed_tables):
    got = {
        r["o_orderstatus"]: (r["n"], r["revenue"])
        for r in _joined(spark, *bucketed_tables).collect()
    }
    o = load(spark, SF_DIR, "orders")
    li = load(spark, SF_DIR, "lineitem")
    want = {
        r["o_orderstatus"]: (r["n"], r["revenue"])
        for r in (
            o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_orderstatus")
            .agg(
                F.count("*").alias("n"),
                F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
            )
            .collect()
        )
    }
    assert got == want and len(got) > 0

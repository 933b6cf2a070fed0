"""Distributed, deterministic global sequence assignment.

The crawl's fetch order must be a total order that any parallelism
reproduces byte-identically (SURVEY.md §4 item 1). A naive
``row_number().over(Window.orderBy(...))`` funnels all rows through ONE
partition — fine at fixture scale, a driver-melting bottleneck at 10^10.

This helper assigns ``seq = global rank`` in three distributed steps:
  1. range-repartition + sort-within-partitions on the (total) sort keys;
  2. count rows per partition (tiny collect: one long per partition);
  3. seq = partition_offset + local row_number.

Because the sort keys are a TOTAL order (url_canon is unique and always the
final key), the resulting seq does not depend on where the range partitioner
drew its boundaries — only on the order itself. Determinism therefore
survives AQE, speculative execution, and any executor count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_global_seq(
    df: DataFrame, keys: list[str], out_col: str = "seq", start: int = 0
) -> DataFrame:
    spark = df.sparkSession
    n_part = max(2, int(spark.conf.get("spark.sql.shuffle.partitions", "8")))
    # repartitionByRange runs a SAMPLING job over the child before the real
    # exchange — an uncached child (here: the scheduler's window chain) would
    # be computed twice per round. Pin it once; the sampling pass materializes
    # the blocks and the exchange reads them back.
    df = df.localCheckpoint(eager=False)
    parted = (
        df.repartitionByRange(n_part, *[F.col(k) for k in keys])
        .sortWithinPartitions(*keys)
        .withColumn("__pid", F.spark_partition_id())
    )
    parted = parted.localCheckpoint(eager=True)  # pin partitioning for both passes
    counts = {r["__pid"]: r["cnt"] for r in parted.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = {}, start
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "__pid int, __off long"
    )
    w = Window.partitionBy("__pid").orderBy(*keys)
    return (
        parted.join(F.broadcast(off_df), "__pid")
        .withColumn(out_col, F.col("__off") + F.row_number().over(w) - 1)
        .drop("__pid", "__off")
    )

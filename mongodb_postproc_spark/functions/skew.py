"""Explicit salting for hot-key joins (the north rule's named remedy for
hot-host skew, alongside repartitionByRange — BASELINE.json north_star).

AQE's skew-join splitting handles most skew at runtime; explicit salting is
the plan-level guarantee for the pathological case AQE can't fix: ONE key
carrying a constant fraction of a 10^10-row fact table, where even a split
shuffle block leaves every subtask of that key on the same join row of the
other side. Salting rewrites the join itself:

- the FACT side gets a deterministic salt in [0, S) hashed from a
  row-unique column (md5-backed xxhash64 — no RNG, reproducible), so the
  hot key's rows spread over S shuffle partitions;
- the DIM side is replicated S times (explode over a literal salt array);
- the join key becomes (key, salt), and every fact row matches exactly the
  one replica carrying its salt — the result is row-for-row identical to
  the unsalted join, asserted in tests/test_skew_salting.py.

Cost model: dim-side replication is S× a (small) dimension, fact side is
untouched — the trade every skew playbook makes. Composes with bucketing
only on the fact side (the salt changes the dim layout), so it is the
remedy of LAST resort after broadcast (small dim) and AQE (moderate skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 8


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    row_unique: str,
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `fact` ⋈ `dim` on `key`, salted to `n_salts` partitions per
    key. `row_unique` is any fact column (or expression) whose per-row hash
    spreads rows; the salt is pmod(xxhash64(row_unique), n_salts) —
    deterministic, no RNG. Output columns = fact.* + dim.* minus the
    duplicate key (same contract as df.join(dim, key, how)).

    Only fact-preserving joins are supported: the dim side is replicated
    n_salts times, so a join type that emits unmatched DIM rows
    (right/full outer) would emit each of them n_salts times. Those raise.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join supports fact-preserving joins only "
            f"(inner/left/left_semi/left_anti), not {how!r}: the replicated "
            f"dim side would duplicate unmatched dim rows {n_salts}x"
        )
    f = fact.withColumn("__salt", F.pmod(F.xxhash64(F.expr(row_unique)), F.lit(n_salts)))
    d = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i).cast("long") for i in range(n_salts)]))
    )
    out = f.join(d, on=[key, "__salt"], how=how)
    return out.drop("__salt")


def skewed_running_sum(
    df: DataFrame,
    part_keys: list[str],
    order_keys: list[str],
    value_col: str,
    out_col: str = "running_sum",
) -> DataFrame:
    """``sum(value) OVER (PARTITION BY part ORDER BY order ROWS UNBOUNDED
    PRECEDING)`` with the hot partition split across tasks.

    A plain running-sum window serializes each PARTITION BY group into one
    task — a pathological key (one host carrying 90% of a shard-packing
    input; LAION-scale crawls have such hosts routinely) runs on one core no
    matter the cluster. This computes the identical integer result as a
    distributed two-level prefix sum:

      1. order-aligned buckets over (part_keys + order_keys) — a pure
         deterministic function of the row (crawl/ordering.py), so a hot
         part spans many buckets and every pass agrees on the assignment;
      2. local running sum per (part, bucket) — parallel across buckets;
      3. per-(part, bucket) totals, prefix-summed per part over its buckets
         (tiny: a part has at most #buckets rows here), kept only where the
         base offset is nonzero — at most one part can straddle each bucket
         boundary, so this is <= #buckets rows REGARDLESS of the number of
         distinct parts, and broadcasts for free;
      4. result = bucket base + local running sum.

    Exact (byte-identical to the single-window plan) for integral/decimal
    values; rejects floating-point value columns (addition order would
    change the low bits). ``order_keys`` must extend ``part_keys`` to a
    total order for the result to be well-defined — same contract as the
    window it replaces.
    """
    from ..crawl.ordering import order_bucket_column
    from pyspark.sql import Window

    vtype = df.schema[value_col].dataType.typeName()
    if vtype in ("double", "float"):
        raise ValueError(
            f"skewed_running_sum is exact for integral/decimal values only; "
            f"{value_col!r} is {vtype} (float addition is order-dependent)"
        )
    df, bucket = order_bucket_column(df, part_keys + order_keys)
    bdf = df.withColumn("__b", bucket)
    w_local = (
        Window.partitionBy(*part_keys, "__b")
        .orderBy(*order_keys)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = bdf.withColumn("__run", F.sum(value_col).over(w_local))
    totals = bdf.groupBy(*part_keys, "__b").agg(F.sum(value_col).alias("__tot"))
    w_base = (
        Window.partitionBy(*part_keys)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bases = (
        totals.withColumn("__base", F.sum("__tot").over(w_base))
        .filter(F.col("__base").isNotNull() & (F.col("__base") != 0))
        .select(*part_keys, "__b", "__base")
    )
    return (
        local.join(F.broadcast(bases), [*part_keys, "__b"], "left")
        .withColumn(out_col, F.col("__run") + F.coalesce(F.col("__base"), F.lit(0)))
        .drop("__b", "__run", "__base")
    )

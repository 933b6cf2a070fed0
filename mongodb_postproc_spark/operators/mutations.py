"""Mutation idioms (SURVEY.md §2.1 S11-S17) — the reference's per-document
update RPCs re-expressed as batch DataFrame transforms + catalog MERGE.

The reference issues one MongoDB RPC per document (`update({'key': k},
{'$set': ...})` ~60 call sites, e.g. /root/reference/analysePauling.py:51-84);
at 100 TB that is N round-trips. Here every idiom is a single declarative
transform over the full table, committed once through the snapshot catalog —
one shuffle, no driver loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def set_fields(df: DataFrame, assignments: dict[str, Column]) -> DataFrame:
    """$set multi=True (analysePauling.py:90): initialize/overwrite columns
    on every row."""
    return df.withColumns(assignments)


def add_to_set(df: DataFrame, array_col: str, value: Column) -> DataFrame:
    """$addToSet (fix_incorrect_structures.py:280): append iff absent,
    NULL array treated as empty."""
    return df.withColumn(
        array_col,
        F.array_union(F.coalesce(F.col(array_col), F.array()), F.array(value)),
    )


def rename_field(df: DataFrame, src: str, dst: str) -> DataFrame:
    """$rename (fix_incorrect_structures.py:277-278): back up src into dst,
    then clear src (the cif_string -> cif_string_old backup idiom)."""
    return df.withColumn(dst, F.col(src)).withColumn(src, F.lit(None).cast(df.schema[src].dataType))


def unset_field(df: DataFrame, col: str) -> DataFrame:
    """$unset (fix_incorrect_structures.py:281): schema is fixed, absent
    becomes NULL."""
    return df.withColumn(col, F.lit(None).cast(df.schema[col].dataType))


def delete_by_keys(df: DataFrame, key: str, keys_df: DataFrame) -> DataFrame:
    """remove({'key': ...}) (analysePauling.py:32) as a left anti join —
    scales as a broadcast join when the key set is small."""
    return df.join(F.broadcast(keys_df), on=key, how="left_anti")


def assert_unique_key(df: DataFrame, key: str) -> None:
    """Unique-index guarantee (S9, analysePauling.py:27): Spark has no
    constraints, so enforce by assertion."""
    dups = df.groupBy(key).count().filter(F.col("count") > 1)
    bad = dups.take(5)
    if bad:
        raise ValueError(f"duplicate keys in {key}: {bad}")

"""Query registry plumbing shared by the operator battery.

Each query is a (spark_fn, oracle_sql) pair: the Spark side is idiomatic
DataFrame API (Catalyst plans it), the oracle is ANSI SQL DuckDB runs on the
same parquet — the driver's correctness gate (SURVEY.md §5). Column names are
aliased identically on both sides (driver hashes values after sorting columns
by name).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


@dataclass
class Query:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL over pre-registered table views; None -> rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        REGISTRY[name] = Query(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco

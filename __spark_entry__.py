"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pricing-summary query at sf0.001;
``queries()`` exposes the full operator battery (SURVEY.md §2 mapping plus
the training-data pipeline ops); ``oracle_sql()`` gives the DuckDB oracle for
every SQL-expressible query (rows-only checks for binary/image ops and the
crawl, which is gated against its own sequential oracle in
tests/test_crawl_order.py instead).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Importing the operator modules populates the registry.
from mongodb_postproc_spark.operators import (  # noqa: E402,F401
    audioops,
    curation,
    graph,
    inventory_ext,
    multimodal,
    records,
    relational,
    scalar,
    similarity,
    textops,
    timeseries,
    videoops,
)
from mongodb_postproc_spark.operators.base import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["a1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}

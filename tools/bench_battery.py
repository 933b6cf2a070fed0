"""Time EVERY registered query at a given scale directory, with reps.

bench.py times the fixed HEADLINE subset the driver tracks round-over-round;
this tool sweeps the full registry so regressions in non-headline queries
are visible between rounds. Round 4's sweep was single-rep and its numbers
were noise-bound (mm_decode_metadata read 3.3x slower with zero code
change); this version runs ``--reps N`` consecutive measurements per query
and records best + median + the raw reps, commit-stamped, with a pure-CPU
host probe at sweep start/end so an artifact carries its own noise
evidence. Prints ONE JSON line:

    {"sf_dir":..., "commit":..., "reps": N, "probe_1p": [start, end],
     "n_queries": N, "total_sec": T,
     "queries": {name: {"best": s, "median": s, "reps": [s, ...]}, ...},
     "slowest": [[name, best_sec], ...]}

Run:  python tools/bench_battery.py [sf_dir] [--reps N] [name ...]
Each measurement is a count() action after a warm-up job; timings include
plan + execution, matching how the driver's bench measures. Consistency of
a committed artifact (best/median derived from its own reps, single commit
stamp) is pinned by tests/test_bench_consistency.py.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
sys.path.insert(0, HERE)


def _git_head() -> str:
    try:
        out = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, cwd=REPO,
        )
        return out.stdout.strip() if out.returncode == 0 else "unknown"
    except OSError:
        return "unknown"


def summarize(per_query_reps: dict[str, list[float]]) -> dict:
    """Best/median per query from raw reps — the exact transform the
    consistency test recomputes. Failed reps are recorded as -1 and
    excluded from the stats (a query with only failures keeps best=-1)."""
    out = {}
    for name, reps in per_query_reps.items():
        ok = [r for r in reps if r >= 0]
        out[name] = {
            "best": min(ok) if ok else -1.0,
            "median": round(statistics.median(ok), 3) if ok else -1.0,
            "reps": reps,
        }
    return out


def main() -> None:
    args = [a for a in sys.argv[1:]]
    reps = 1
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i:i + 2]
    sf_dir = args[0] if args and not args[0].startswith("-") else "/root/testdata/sf0.1"
    name_filter = args[1:] if args and not args[0].startswith("-") else args

    from host_probe import measure

    probe_start = measure(1)

    from mongodb_postproc_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("bench_battery", bench=True)
    qs = entrymod.queries()
    names = [n for n in sorted(qs) if not name_filter or n in name_filter]

    # warm the job machinery + parquet datasource path (see bench.py)
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    raw: dict[str, list[float]] = {}
    t_all = time.monotonic()
    for name in names:
        raw[name] = []
        for rep in range(reps):
            t0 = time.monotonic()
            try:
                qs[name](spark, sf_dir).count()
                raw[name].append(round(time.monotonic() - t0, 3))
            except Exception as exc:  # keep sweeping; a failure is the headline
                raw[name].append(-1.0)
                print(f"[bench-battery] {name} rep {rep} FAILED: {exc}", file=sys.stderr)
        print(f"[bench-battery] {name}: {raw[name]}", file=sys.stderr, flush=True)
    total = round(time.monotonic() - t_all, 2)
    probe_end = measure(1)

    queries = summarize(raw)
    slowest = sorted(
        ((n, q["best"]) for n, q in queries.items()), key=lambda kv: -kv[1]
    )[:10]
    print(json.dumps({
        "sf_dir": sf_dir,
        "commit": _git_head(),
        "reps": reps,
        "probe_1p": [probe_start, probe_end],
        "n_queries": len(queries),
        "total_sec": total,
        "queries": queries,
        "slowest": [[n, s] for n, s in slowest],
    }))


if __name__ == "__main__":
    main()

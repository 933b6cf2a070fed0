"""spark-submit entry point for the crawl engine.

Run via tools/submit_crawl.sh, which zips the package and launches:

    spark-submit --master <master> --py-files /tmp/mongodb_postproc_spark.zip \
        tools/submit_crawl.py --n-seeds 5000 --rounds 2 --workdir /tmp/crawl_wd

On a real cluster only --master changes (the session builder inherits
master/executor conf from spark-submit); the engine code is identical —
partitioning, salting, and the snapshot catalog do not care how many
executors back the session. Prints one JSON line of round stats.
"""

from __future__ import annotations

import argparse
import json
import tempfile


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-seeds", type=int, default=5000)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--per-host-cap", type=int, default=50)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    # Import AFTER spark-submit has shipped the --py-files zip.
    from pyspark.sql import SparkSession

    from mongodb_postproc_spark.crawl.engine import CrawlEngine
    from mongodb_postproc_spark.datagen.web import CrawlConfig, WebConfig

    spark = (
        SparkSession.builder.appName("crawl-submit")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    wd = args.workdir or tempfile.mkdtemp(prefix="submit_crawl_")
    cfg = CrawlConfig(
        n_seeds=args.n_seeds,
        max_rounds=args.rounds,
        per_host_cap=args.per_host_cap,
        web=WebConfig(n_hosts=97, hot_pages=5_000, cold_pages=500, seed="submit-v1"),
    )
    eng = CrawlEngine(spark, cfg, wd, expected_urls=max(args.n_seeds * 8, 100_000))
    stats = eng.run(resume=args.resume)
    print(
        json.dumps(
            {
                "workdir": wd,
                "rounds": [
                    {
                        "round": s.round,
                        "fetched": s.fetched,
                        "new_urls": s.new_urls,
                        "frontier_after": s.frontier_after,
                        "seen_after": s.seen_after,
                    }
                    for s in stats
                ],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

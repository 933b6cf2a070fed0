"""The Spark crawl engine: frontier + fetch scheduler.

DataFrame re-expression of the crawl spec in ``simulator.py`` (which mirrors
/root/reference/findMissingPages.py:24-44). Each round is a short DAG of
declarative ops — Catalyst plans it, AQE handles runtime skew — with every
ordering decision made a *data* property so any parallelism produces the
byte-identical fetch order:

  frontier ──(salted per-host top-k window)──► scheduled
           ──(broadcast robots join: politeness slots)──► offset_ms
           ──(distributed global rank, ordering.py)──► seq
           ──(mapInPandas fetch: Arrow batches, no per-row Python)──► pages
           ──(posexplode links → canonicalize → min-ts dedup)──► candidates
           ──(Bloom prefilter + exact anti-join seen)──► new URLs
           ──(robots split)──► frontier' / blocked
  all state committed per round through the snapshot catalog (tables.py);
  _state.json (written last, atomic) pins the consistent snapshot set for
  exact checkpoint/resume with per-partition lineage.

Skew: the hot host dominates the frontier (30% of links). The scheduling
window partitions by host, so before the exact per-host top-k we take a
SALTED partial top-k per (host, salt) — top-cap of every salt bucket is a
superset of the global per-host top-cap — which caps any single task's input
at ~n_salts×cap rows regardless of host skew. This is the explicit
salting/repartitioning the north rule requires; AQE skew-join handles the
residual joins.

Bloom at 10^10: the merged-broadcast filter here is right up to ~10^8 seen
URLs (1.2 MB per 10^6 at 1% fpp). Beyond that, partition the seen set by
``pmod(h60(url), P)`` and have each query task load only its slice's bloom
from the state table (same rows, same semantics — a loader change, not a
design change); the exact anti-join confirmer is unchanged.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..datagen.images import decode_image, make_image, make_images, psnr
from ..datagen.web import CrawlConfig, SyntheticWeb
from ..tables import TableCatalog
from .canonicalize import canonical_url_col, canonicalize_py, host_col
from .ordering import assign_global_seq
from .seen import Bloom, build_state_rows, merge_state

FETCH_SCHEMA = (
    "seq long, url_canon string, host string, depth int, round int, "
    "links array<string>, image_id string, bytes binary, w int, h int, "
    "fmt string, caption string, phash long, pid int"
)

FRONTIER_COLS = ["url_canon", "host", "priority", "discovery_ts", "depth"]

N_SALTS = 8
SALT_PREPASS_MAX_CAP = 10_000  # politeness caps are small; beyond this the cap
# cannot meaningfully bind and the pre-pass shuffle is pure overhead

_TIMING = os.environ.get("SPARK_GRAFT_TIMING", "") == "1"


class _StageTimer:
    """Wall-clock attribution between action boundaries (env-gated; the
    per-round metrics table is the production path, this is the dev loop)."""

    def __init__(self, tag: str):
        self.tag = tag
        self.t = time.monotonic()

    def mark(self, stage: str) -> None:
        now = time.monotonic()
        if _TIMING:
            print(f"[timing] {self.tag} {stage}: {now - self.t:.2f}s", flush=True)
        self.t = now


def _fetch_factory(cfg: CrawlConfig, rnd: int):
    """mapInPandas fetch stage: synthetic GET + link extraction + image
    payload, vectorized per Arrow batch (analog of requests.get + xpath at
    /root/reference/findMissingPages.py:29-35, and of the CIF-payload
    decode U1 — here the payload is the image)."""

    def fetch(batches):
        web = SyntheticWeb(cfg.web)
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        for pdf in batches:
            urls = list(pdf["url_canon"])
            imgs = make_images(urls)  # batch-vectorized payload synthesis
            recs = [
                {
                    "seq": int(seq),
                    "url_canon": url,
                    "host": host,
                    "depth": int(depth),
                    "round": rnd,
                    "links": web.links_for(url),
                    "pid": pid,
                    **img,
                }
                for seq, url, host, depth, img in zip(
                    pdf["seq"], urls, pdf["host"], pdf["depth"], imgs
                )
            ]
            yield pd.DataFrame(recs) if recs else pd.DataFrame(
                columns=["seq", "url_canon", "host", "depth", "round", "links", "pid",
                         "image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
            )

    return fetch


@dataclass
class RoundStats:
    round: int
    fetched: int
    links_extracted: int
    new_urls: int
    frontier_after: int
    seen_after: int


class CrawlEngine:
    def __init__(self, spark: SparkSession, cfg: CrawlConfig, workdir: str,
                 use_bloom: bool = True, bloom_fpp: float = 0.01,
                 expected_urls: int = 200_000):
        self.spark = spark
        self.cfg = cfg
        self.catalog = TableCatalog(workdir)
        self.workdir = workdir
        self.use_bloom = use_bloom
        sizing = Bloom.sized_for(expected_urls, bloom_fpp)
        self.bloom_bits, self.bloom_hashes = sizing.n_bits, sizing.n_hashes

    # ---------------------------------------------------------------- state
    def _state_path(self) -> str:
        return os.path.join(self.workdir, "_state.json")

    def _commit_state(self, state: dict) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.workdir)
        with os.fdopen(fd, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self._state_path())

    def load_state(self) -> dict | None:
        p = self._state_path()
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def _read(self, name: str, state: dict) -> DataFrame:
        return self.catalog.read(name, self.spark, snapshot=state["snapshots"].get(name))

    def _upsert(self, name: str, df: DataFrame) -> None:
        """Append to an existing table, create it on the first round."""
        if self.catalog.exists(name):
            self.catalog.append(name, df)
        else:
            self.catalog.create_or_replace(name, df)

    # ---------------------------------------------------------------- robots
    def _robots_df(self) -> DataFrame:
        rows = SyntheticWeb(self.cfg.web).robots_rows()
        return self.spark.createDataFrame(
            pd.DataFrame(rows),
            "host string, disallow_prefixes array<string>, crawl_delay_ms long",
        )

    @staticmethod
    def _blocked_col():
        path = F.regexp_replace(F.col("url_canon"), r"^[a-z][a-z0-9+.\-]*://[^/]*", "")
        rules = F.coalesce(F.col("disallow_prefixes"), F.array())
        return F.exists(rules, lambda p: path.startswith(p))

    def _split_robots(self, df: DataFrame, robots: DataFrame) -> tuple[DataFrame, DataFrame]:
        """(allowed, blocked) — broadcast hash join, prefix-match filter."""
        joined = df.join(
            F.broadcast(robots.select("host", "disallow_prefixes")), "host", "left"
        ).withColumn("__blocked", self._blocked_col())
        allowed = joined.filter(~F.col("__blocked")).drop("__blocked", "disallow_prefixes")
        blocked = joined.filter(F.col("__blocked")).drop("__blocked", "disallow_prefixes")
        return allowed, blocked

    # ---------------------------------------------------------------- seen
    def _load_bloom(self, state: dict | None) -> Bloom | None:
        if not self.use_bloom or state is None or "seen_state" not in state["snapshots"]:
            return None
        rows = self._read("seen_state", state).collect()
        return merge_state([r.asDict() for r in rows])

    def _filter_unseen(self, candidates: DataFrame, seen: DataFrame | None,
                       bloom: Bloom | None) -> DataFrame:
        """Exact-unseen subset of candidates. Bloom prunes the anti-join:
        bloom-negative rows are definitely new (no shuffle); bloom-positive
        rows are confirmed by the exact anti-join (no false drops)."""
        if seen is None:
            return candidates
        if bloom is None:
            return candidates.join(seen, "url_canon", "left_anti")
        bloom_bytes = bloom.to_bytes()

        @F.pandas_udf("boolean")
        def might_contain(urls: pd.Series) -> pd.Series:
            # deserialize once per python worker, not per Arrow batch — at
            # large rounds the filter is tens of MB and the per-batch
            # decompress would dominate the whole stage
            global _BLOOM_CACHE
            try:
                cached_key, b = _BLOOM_CACHE
            except NameError:
                cached_key, b = None, None
            if cached_key != id(bloom_bytes) or b is None:
                b = Bloom.from_bytes(bloom_bytes)
                _BLOOM_CACHE = (id(bloom_bytes), b)
            return pd.Series(b.contains(urls))

        flagged = candidates.withColumn("__maybe", might_contain("url_canon"))
        flagged = flagged.localCheckpoint(eager=False)
        definite_new = flagged.filter(~F.col("__maybe")).drop("__maybe")
        confirmed_new = (
            flagged.filter(F.col("__maybe")).drop("__maybe").join(seen, "url_canon", "left_anti")
        )
        return definite_new.unionByName(confirmed_new)

    def _append_seen_state(self, new_urls: DataFrame, epoch: int) -> None:
        if not self.use_bloom:
            return
        nb, nh = self.bloom_bits, self.bloom_hashes
        rows = (
            new_urls.select("url_canon")
            .repartition(max(2, new_urls.sparkSession.sparkContext.defaultParallelism // 4))
            .withColumn("__pid", F.spark_partition_id())
            .mapInPandas(
                lambda it: build_state_rows(it, epoch, nb, nh),
                "partition_id int, epoch int, bloom_bytes binary, n_items long",
            )
        )
        if self.catalog.exists("seen_state"):
            self.catalog.append("seen_state", rows)
        else:
            self.catalog.create_or_replace("seen_state", rows)

    # ---------------------------------------------------------------- init
    def init_crawl(self) -> None:
        """Round -1: canonicalize + dedup + robots-split the seed list."""
        tm = _StageTimer("init")
        web_cfg = self.cfg.web

        def gen_seeds(batches):
            web = SyntheticWeb(web_cfg)
            for pdf in batches:
                ids = pdf["id"].astype("int64")
                yield pd.DataFrame(
                    {"raw_url": [web.seed_url_at(int(s)) for s in ids], "discovery_ts": ids}
                )

        # seed generation is index-addressable, so it runs ON THE EXECUTORS
        # (a 10^10-entry seed list can never be built on the driver; the
        # production analog is a distributed read of a seed file)
        n_part = max(2, self.spark.sparkContext.defaultParallelism)
        seeds = (
            self.spark.range(0, self.cfg.n_seeds, 1, numPartitions=n_part)
            .mapInPandas(gen_seeds, "raw_url string, discovery_ts long")
            .withColumn("url_canon", canonical_url_col(F.col("raw_url")))
            .filter(F.col("url_canon").isNotNull())
            .withColumn("host", host_col(F.col("url_canon")))
            .withColumn("priority", F.lit(0))
            .withColumn("depth", F.lit(0))
        )
        w = Window.partitionBy("url_canon").orderBy("discovery_ts")
        seeds = (
            seeds.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .localCheckpoint(eager=False)  # canonicalize+dedup once, not per write
        )
        allowed, blocked = self._split_robots(seeds.select(*FRONTIER_COLS), self._robots_df())

        tm.mark("seed_gen")
        self.catalog.create_or_replace("frontier", allowed.select(*FRONTIER_COLS))
        self.catalog.create_or_replace("seen", seeds.select("url_canon"))
        self.catalog.create_or_replace("blocked", blocked.select("url_canon"))
        tm.mark("seed_writes")
        self._append_seen_state(seeds.select("url_canon"), epoch=-1)
        tm.mark("seed_state")
        counts = seeds.agg(
            F.count("*").alias("n_seen"),
        ).collect()[0]
        n_seen = counts["n_seen"]
        n_blocked = blocked.count()
        state = {
            "round_completed": -1,
            "next_seq": 0,
            # running row counters: derived bookkeeping that saves two
            # full-table count jobs per round (the job-latency floor is the
            # round's serial fraction — it caps scaling efficiency)
            "frontier_count": n_seen - n_blocked,
            "seen_count": n_seen,
            "snapshots": {
                t: self.catalog.snapshots(t)[-1]["id"]
                for t in ("frontier", "seen", "blocked", "seen_state")
                if self.catalog.exists(t)
            },
        }
        self._commit_state(state)

    # ---------------------------------------------------------------- round
    def run_round(self, state: dict) -> tuple[dict, RoundStats] | None:
        rnd = state["round_completed"] + 1
        tm = _StageTimer(f"round{rnd}")
        frontier = self._read("frontier", state)
        # counter bookkeeping replaces an isEmpty() probe job; states written
        # by older checkpoints fall back to the probe
        if state.get("frontier_count", None) is not None:
            if state["frontier_count"] == 0:
                return None
        elif frontier.isEmpty():
            return None
        tm.mark("frontier_empty_check")
        seen = self._read("seen", state)
        robots = self._robots_df()
        cap = self.cfg.per_host_cap

        # -- schedule: salted partial top-k defuses hot-host window skew,
        #    then the exact per-host politeness window (SURVEY.md W5). The
        #    salted pre-pass only pays for itself when the cap actually
        #    binds (top-cap of each salt bucket is a superset of the global
        #    per-host top-cap); with an effectively-unbounded cap it is a
        #    wasted full-window shuffle, so skip it.
        if cap < SALT_PREPASS_MAX_CAP:
            salted = frontier.withColumn(
                "__salt", F.pmod(F.xxhash64("url_canon"), F.lit(N_SALTS))
            )
            w_salt = Window.partitionBy("host", "__salt").orderBy(
                "priority", "discovery_ts", "url_canon"
            )
            pre = (
                salted.withColumn("__sr", F.row_number().over(w_salt))
                .filter(F.col("__sr") <= cap)
                .drop("__salt", "__sr")
            )
        else:
            pre = frontier
        w_host = Window.partitionBy("host").orderBy("priority", "discovery_ts", "url_canon")
        sched = (
            pre.withColumn("__hr", F.row_number().over(w_host))
            .filter(F.col("__hr") <= cap)
            .join(F.broadcast(robots.select("host", "crawl_delay_ms")), "host", "left")
            .withColumn(
                "offset_ms",
                (F.col("__hr") - 1) * F.coalesce(F.col("crawl_delay_ms"), F.lit(100)),
            )
            .drop("__hr", "crawl_delay_ms")
        )
        sched = assign_global_seq(
            sched, ["offset_ms", "host", "url_canon"], out_col="seq", start=state["next_seq"]
        )
        # reused by the fetch input AND the frontier anti-join — plan once
        sched = sched.localCheckpoint(eager=False)
        if _TIMING:
            sched.count()
            tm.mark("schedule_only")

        # -- fetch (Arrow-vectorized; order is carried by seq, not wall
        #    clock). The parquet write IS the materialization: fetch runs
        #    exactly once, and every downstream consumer (link extraction,
        #    counts, lineage, the fetch_log/images projections) reads back
        #    only the columns it needs — parquet column pruning means the
        #    image bytes are written once and never re-serialized.
        fetched = sched.select("seq", "url_canon", "host", "depth").mapInPandas(
            _fetch_factory(self.cfg, rnd), FETCH_SCHEMA
        )
        self._upsert("pages", fetched)
        results = self.catalog.read("pages", self.spark).filter(F.col("round") == rnd)
        tm.mark("schedule+fetch+write_pages")

        # -- extract + canonicalize + in-batch dedup (first discovery wins)
        children = (
            results.select("seq", "depth", F.posexplode("links").alias("link_index", "raw_url"))
            .withColumn("url_canon", canonical_url_col(F.col("raw_url")))
            .filter(F.col("url_canon").isNotNull())
            .withColumn(
                "discovery_ts",
                F.col("seq") * F.lit(self.cfg.link_tick) + F.col("link_index"),
            )
            .withColumn("depth", F.col("depth") + 1)
            .withColumn("priority", F.col("depth"))
            .withColumn("host", host_col(F.col("url_canon")))
        )
        w_dedup = Window.partitionBy("url_canon").orderBy("discovery_ts")
        children = (
            children.withColumn("__rn", F.row_number().over(w_dedup))
            .filter(F.col("__rn") == 1)
            .select(*FRONTIER_COLS)
        )
        if _TIMING:
            children.count()
            tm.mark("extract_children_only")

        # -- seen-set check (Bloom prefilter + exact anti-join confirmer)
        bloom = self._load_bloom(state)
        tm.mark("bloom_load")
        new_urls = self._filter_unseen(children, seen, bloom).localCheckpoint(eager=True)
        tm.mark("extract+dedup+unseen")
        allowed_new, blocked_new = self._split_robots(new_urls, robots)

        # -- commit next state through the catalog (order-safe: _state.json
        #    last, so a crash mid-commit resumes from the previous round)
        frontier_next = frontier.join(
            sched.select("url_canon"), "url_canon", "left_anti"
        ).unionByName(allowed_new.select(*FRONTIER_COLS))
        crow = results.agg(
            F.count("*").alias("n_fetched"), F.sum(F.size("links")).alias("n_links")
        ).collect()[0]
        n_fetched = crow["n_fetched"]
        links_extracted = crow["n_links"] or 0
        n_new = new_urls.count()
        tm.mark("counts")

        self.catalog.create_or_replace("frontier", frontier_next)
        tm.mark("write_frontier")
        self.catalog.append("seen", new_urls.select("url_canon"))
        n_blocked_new = blocked_new.count()  # parent is checkpointed: cheap
        if n_blocked_new:
            self.catalog.append("blocked", blocked_new.select("url_canon"))
        tm.mark("write_seen+blocked")
        self._append_seen_state(new_urls.select("url_canon"), epoch=rnd)
        tm.mark("write_seen_state")

        # per-partition lineage (north rule: partition_id, bloom epoch,
        # last url hash, rows fetched)
        lineage = results.groupBy("pid").agg(
            F.count("*").alias("rows_fetched"),
            F.max(F.xxhash64("url_canon")).alias("last_url_hash"),
        ).withColumn("round", F.lit(rnd)).withColumn("bloom_epoch", F.lit(rnd)).select(
            F.col("pid").alias("partition_id"), "bloom_epoch", "last_url_hash", "rows_fetched", "round"
        )
        self._upsert("lineage", lineage)

        tm.mark("write_lineage")
        # derived from the running counters (scheduled URLs leave the
        # frontier, allowed-new enter; every new URL enters seen) — replaces
        # two full-table count jobs per round
        prev_frontier = state.get("frontier_count")
        prev_seen = state.get("seen_count")
        if prev_frontier is None or prev_seen is None:  # legacy checkpoint
            frontier_after = self.catalog.read("frontier", self.spark).count()
            seen_after = self.catalog.read("seen", self.spark).count()
        else:
            frontier_after = prev_frontier - n_fetched + (n_new - n_blocked_new)
            seen_after = prev_seen + n_new
        tm.mark("post_counts")
        stats = RoundStats(rnd, n_fetched, int(links_extracted), n_new, frontier_after, seen_after)
        metrics_pdf = pd.DataFrame(
            [
                {"round": rnd, "metric": k, "value": float(v)}
                for k, v in vars(stats).items()
                if k != "round"
            ]
        )
        metrics_df = self.spark.createDataFrame(metrics_pdf, "round int, metric string, value double")
        metrics_df = metrics_df.withColumn("round", F.lit(rnd))
        self._upsert("metrics", metrics_df)

        new_state = {
            "round_completed": rnd,
            "next_seq": state["next_seq"] + n_fetched,
            "frontier_count": frontier_after,
            "seen_count": seen_after,
            "snapshots": {
                t: self.catalog.snapshots(t)[-1]["id"]
                for t in (
                    "frontier", "seen", "blocked", "pages",
                    "seen_state", "lineage", "metrics",
                )
                if self.catalog.exists(t)
            },
        }
        self._commit_state(new_state)
        return new_state, stats

    def _reconcile_to_state(self, state: dict) -> None:
        """Roll every table back to the snapshot the committed state
        references, dropping data written by a crashed round (the state file
        is the commit point; anything past it never happened)."""
        referenced = state["snapshots"]
        for name in self.catalog.tables():
            if name in referenced:
                self.catalog.rollback_to(name, referenced[name])
            else:
                self.catalog.drop(name)

    # ---------------------------------------------------------------- run
    def run(self, resume: bool = False) -> list[RoundStats]:
        state = self.load_state() if resume else None
        if state is None:
            self.init_crawl()
            state = self.load_state()
        elif resume:
            self._reconcile_to_state(state)
        all_stats: list[RoundStats] = []
        while state["round_completed"] + 1 < self.cfg.max_rounds:
            out = self.run_round(state)
            if out is None:
                break
            state, stats = out
            all_stats.append(stats)
        return all_stats

    # ---------------------------------------------------------------- reads
    # fetch_log and images are PROJECTIONS of the single `pages` landing
    # table — parquet column pruning makes each read touch only its columns
    # (the bytes column is written once at fetch time, never re-serialized).
    def fetch_log(self) -> DataFrame:
        return (
            self.catalog.read("pages", self.spark)
            .select("seq", "url_canon", "host", "round")
            .orderBy("seq")
        )

    def seen_set(self) -> DataFrame:
        return self.catalog.read("seen", self.spark)

    def images(self) -> DataFrame:
        return self.catalog.read("pages", self.spark).select(
            "image_id", "bytes", "w", "h", "fmt", "caption", "phash", "url_canon", "seq"
        )


def validate_images(images: DataFrame) -> DataFrame:
    """Per-row invariants vs the reference payload (BASELINE.json input_hint):
    decoded-pixel allclose / PSNR>=40dB for lossy, caption string equality,
    phash equality. Vectorized pandas UDF — the tolerance-equality pattern of
    /root/reference/compositionMatcher.py:60 applied to pixels.
    Returns rows that VIOLATE an invariant (empty DataFrame == all good)."""

    def check(batches):
        for pdf in batches:
            bad = []
            for _, row in pdf.iterrows():
                ref = make_image(row["url_canon"])
                try:
                    got = decode_image(row["bytes"], row["fmt"])
                    ref_px = decode_image(ref["bytes"], ref["fmt"])
                except NotImplementedError:
                    continue  # jpeg stub: plumbing-only rows
                p = psnr(ref_px, got)
                ok = (
                    (p >= 40.0 if row["fmt"] == "jpeg" else bool((ref_px == got).all()))
                    and row["caption"] == ref["caption"]
                    and int(row["phash"]) == ref["phash"]
                )
                if not ok:
                    bad.append({"image_id": row["image_id"], "url_canon": row["url_canon"],
                                "psnr": float(p)})
            yield pd.DataFrame(bad) if bad else pd.DataFrame(
                columns=["image_id", "url_canon", "psnr"]
            )

    return images.mapInPandas(check, "image_id string, url_canon string, psnr double")

"""Snapshot-versioned table catalog.

The design target is Iceberg (the north rule lands crawl state and the
image+caption table in Iceberg). The sandbox image has no Iceberg runtime
jar, so this module implements the same *contract* on plain parquet:

    catalog.create_or_replace(name, df)   # CTAS             (Iceberg: createOrReplace)
    catalog.append(name, df)              # append snapshot  (Iceberg: append)
    catalog.read(name)                    # latest snapshot
    catalog.read(name, snapshot=k)        # time travel
    catalog.snapshots(name)               # snapshot log
    catalog.merge_upsert(name, src, key)  # MERGE INTO ... WHEN MATCHED UPDATE
                                          #   (reference's $set-by-key idiom,
                                          #    /root/reference/analysePauling.py:51-84)

Layout on disk::

    root/<table>/snap=<k>/part-*.parquet     one dir per committed snapshot
    root/<table>/_manifest.json              snapshot log (k, kind, parents)

A snapshot is immutable once written; ``read`` unions the parquet dirs the
manifest says compose the current view (append chains), exactly how Iceberg
manifests compose data files. Crash safety: the manifest is written last via
atomic rename, so a crashed write leaves an orphan dir that is never read —
this is what makes the crawl checkpoint/resume exact.

At 100 TB the only change is the catalog identifier: every call site already
goes through this facade, so swapping in `spark.table("catalog.db.tbl")` /
`writeTo(...)` is a one-module change.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession


class TableCatalog:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------------- manifest
    def _mpath(self, name: str) -> str:
        return os.path.join(self.root, name, "_manifest.json")

    def _load_manifest(self, name: str) -> dict:
        p = self._mpath(name)
        if not os.path.exists(p):
            return {"snapshots": []}
        with open(p) as f:
            return json.load(f)

    def _commit_manifest(self, name: str, manifest: dict) -> None:
        d = os.path.join(self.root, name)
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".manifest.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._mpath(name))  # atomic commit point

    def snapshots(self, name: str) -> list[dict]:
        return self._load_manifest(name)["snapshots"]

    def exists(self, name: str) -> bool:
        return bool(self.snapshots(name))

    # ------------------------------------------------------------- writes
    def _write_snapshot(self, name: str, df: DataFrame, kind: str) -> int:
        manifest = self._load_manifest(name)
        snaps = manifest["snapshots"]
        snap_id = (snaps[-1]["id"] + 1) if snaps else 0
        data_dir = os.path.join(self.root, name, f"snap={snap_id}")
        df.write.mode("overwrite").parquet(data_dir)
        if kind == "replace":
            members = [snap_id]
        else:  # append: current members + this dir
            members = (snaps[-1]["members"] if snaps else []) + [snap_id]
        snaps.append({"id": snap_id, "kind": kind, "members": members})
        self._commit_manifest(name, manifest)
        return snap_id

    def create_or_replace(self, name: str, df: DataFrame) -> int:
        return self._write_snapshot(name, df, "replace")

    def append(self, name: str, df: DataFrame) -> int:
        return self._write_snapshot(name, df, "append")

    def merge_upsert(self, name: str, src: DataFrame, key: str) -> int:
        """MERGE INTO name USING src ON key: matched rows replaced, new rows
        inserted. Batch equivalent of the reference's per-doc update($set)
        RPC storm (/root/reference/analysePauling.py:51-84) — one shuffle
        instead of N round-trips."""
        tgt = self.read(name, src.sparkSession)
        merged = tgt.join(src.select(key), on=key, how="left_anti").unionByName(
            src, allowMissingColumns=False
        )
        return self.create_or_replace(name, merged)

    def drop(self, name: str) -> None:
        d = os.path.join(self.root, name)
        if os.path.exists(d):
            shutil.rmtree(d)

    def rollback_to(self, name: str, snapshot_id: int) -> None:
        """Truncate the snapshot log after ``snapshot_id``, deleting orphan
        data dirs. Appends chain off the manifest tip, so snapshots written
        by a CRASHED round (data landed, _state.json never updated) must be
        rolled back before the round retries — otherwise the retry's append
        would chain the orphan data into its member list (duplicate rows)."""
        manifest = self._load_manifest(name)
        snaps = manifest["snapshots"]
        keep = [s for s in snaps if s["id"] <= snapshot_id]
        if len(keep) == len(snaps):
            return
        if not any(s["id"] == snapshot_id for s in keep):
            raise ValueError(f"snapshot {snapshot_id} not found for table {name!r}")
        for s in snaps[len(keep):]:
            shutil.rmtree(os.path.join(self.root, name, f"snap={s['id']}"), ignore_errors=True)
        manifest["snapshots"] = keep
        self._commit_manifest(name, manifest)

    def tables(self) -> list[str]:
        if not os.path.isdir(self.root):
            return []
        return sorted(
            d for d in os.listdir(self.root)
            if os.path.isfile(os.path.join(self.root, d, "_manifest.json"))
        )

    # ------------------------------------------------------------- reads
    def read(self, name: str, spark: SparkSession, snapshot: int | None = None) -> DataFrame:
        snaps = self.snapshots(name)
        if not snaps:
            raise FileNotFoundError(f"table {name!r} not in catalog {self.root}")
        entry = snaps[-1] if snapshot is None else next(s for s in snaps if s["id"] == snapshot)
        dirs = [os.path.join(self.root, name, f"snap={m}") for m in entry["members"]]
        return spark.read.parquet(*dirs)

"""Streaming sink into the snapshot catalog (foreachBatch + idempotent
MERGE — the streaming→Iceberg landing pattern).

Structured Streaming's file sink can only append; a frontier/metrics
deployment needs UPSERT into the same snapshot-catalog tables the batch
engine maintains (tables.py). The standard production pattern is
``foreachBatch`` + MERGE keyed on the row id, and the exactly-once story is
the composition of two properties rather than a distributed transaction:

- the checkpointed source replays an interrupted micro-batch with the SAME
  content (file source + checkpointLocation pin offsets per batch id), and
- ``TableCatalog.merge_upsert`` is IDEMPOTENT for identical input (the
  equality-delete of the batch's keys followed by re-appending the same
  rows leaves the visible table unchanged),

so a batch applied once or twice (crash between sink write and checkpoint
commit) yields the same table — exactly-once EFFECT, asserted in
tests/test_stream_sink.py by replaying batches and by killing/resuming a
checkpointed query. Per micro-batch cost is O(|batch|) I/O (merge-on-read
delete file + append), never a table rewrite — at 10^10 rows the sink cost
tracks the stream rate, not the table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..tables import TableCatalog


def upsert_stream(
    stream_df: DataFrame,
    catalog: TableCatalog,
    table: str,
    key: str,
    checkpoint_dir: str,
    query_name: str = "catalog_upsert",
):
    """Start a streaming query landing `stream_df` into `catalog`.`table`
    by MERGE on `key`. Returns the StreamingQuery (availableNow trigger —
    callers drive finite sources to completion; drop the trigger for a
    long-running deployment)."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if not catalog.exists(table):
            catalog.create_or_replace(table, batch_df)
        else:
            catalog.merge_upsert(table, batch_df, key)

    return (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .queryName(query_name)
        .start()
    )

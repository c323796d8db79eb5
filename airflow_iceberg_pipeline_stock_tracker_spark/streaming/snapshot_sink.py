"""Exactly-once streaming sink through the snapshot layer.

The reference writes its streaming-shaped daily loads into Iceberg
tables, whose commit protocol is what makes `foreachBatch` exactly-once
in practice (a replayed batch must not double-append). This module
composes the repo's two halves of that story: Structured Streaming's
micro-batch replay (a batch id is stable across retries) and
`sources/snapshots.py`'s CAS manifest commits with idempotent tags —
`tag=f"batch-{batch_id}"` makes re-delivery a no-op *inside the same
compare-and-swap loop that publishes the manifest*, so even a crash
between the sink's data write and its commit cannot double-apply.

Scale notes: each micro-batch append is O(batch) data + one ~KB
manifest publish; the snapshot table is readable (with time travel)
DURING ingestion because readers resolve a committed manifest first.
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame

from ..sources import snapshots


def snapshot_append_sink(table_dir: str) -> Callable[[DataFrame, int], None]:
    """foreachBatch handler: append each micro-batch as one tagged
    snapshot commit. Safe under Structured Streaming's replay contract:
    the batch id IS the idempotency tag."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        snapshots.commit(
            batch_df, table_dir, mode="append", tag=f"batch-{batch_id}"
        )

    return handle


def drain_to_snapshots(stream_df: DataFrame, table_dir: str) -> None:
    """Drain an AvailableNow stream into ``table_dir`` via tagged
    snapshot commits; blocks until every pending micro-batch committed."""
    q = (
        stream_df.writeStream.foreachBatch(snapshot_append_sink(table_dir))
        .option("checkpointLocation", tempfile.mkdtemp(prefix="snap_sink_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

"""Exactly-once streaming sink through the snapshot layer.

The reference writes its streaming-shaped daily loads into Iceberg
tables, whose commit protocol is what makes `foreachBatch` exactly-once
in practice (a replayed batch must not double-append). This module
composes the repo's two halves of that story: Structured Streaming's
micro-batch replay (a batch id is stable across retries) and
`sources/snapshots.py`'s CAS manifest commits with idempotent tags —
the tag makes re-delivery a no-op *inside the same compare-and-swap
loop that publishes the manifest*, so even a crash between the sink's
data write and its commit cannot double-apply.

Tag namespacing (Delta's txnAppId+txnVersion pattern): batch ids are
only unique WITHIN one streaming query's checkpoint — they restart at 0
for every fresh checkpoint. A bare ``batch-{id}`` tag would therefore
make a SECOND drain into the same table silently drop all its
micro-batches as "replays" of the first drain's. Each sink carries a
``run_id`` (defaulting to the checkpoint directory's basename, which is
exactly as stable as the batch ids it qualifies): same checkpoint →
same run_id → crash-replay stays a no-op; new checkpoint → new run_id →
new data commits.

Scale notes: each micro-batch append is O(batch) data + one ~KB
manifest publish; the snapshot table is readable (with time travel)
DURING ingestion because readers resolve a committed manifest first.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame

from ..sources import snapshots


def snapshot_append_sink(
    table_dir: str, run_id: str = ""
) -> Callable[[DataFrame, int], None]:
    """foreachBatch handler: append each micro-batch as one tagged
    snapshot commit. Safe under Structured Streaming's replay contract:
    (run_id, batch id) IS the idempotency tag — pass the run_id that
    owns the stream's checkpoint (``drain_to_snapshots`` derives it from
    the checkpoint path); an empty run_id reproduces the legacy
    single-drain-per-table tag ``batch-{id}``."""

    prefix = f"{run_id}-" if run_id else ""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        snapshots.commit(
            batch_df, table_dir, mode="append", tag=f"{prefix}batch-{batch_id}"
        )

    return handle


def drain_to_snapshots(
    stream_df: DataFrame,
    table_dir: str,
    checkpoint_dir: str | None = None,
    run_id: str | None = None,
) -> str:
    """Drain an AvailableNow stream into ``table_dir`` via tagged
    snapshot commits; blocks until every pending micro-batch committed.

    Returns the run_id used for the drain's tags. Re-running with the
    SAME ``checkpoint_dir`` resumes/replays idempotently (same run_id,
    same batch ids); a fresh call mints a fresh checkpoint AND a fresh
    run_id, so repeated drains into one table each land their data
    instead of being mistaken for replays."""
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="snap_sink_ckpt_")
    if run_id is None:
        run_id = os.path.basename(os.path.normpath(checkpoint_dir))
    q = (
        stream_df.writeStream.foreachBatch(
            snapshot_append_sink(table_dir, run_id)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return run_id

"""Streaming deduplication for at-least-once pipelines.

Two operators over streaming frames:

  dedup_events        drop replayed events by event_id within a
                      watermark — the exactly-once repair for an
                      at-least-once delivery bus. State is bounded: an
                      id is remembered only until the watermark passes
                      its event time (`dropDuplicatesWithinWatermark`).
  exact_dedup_stream  the streaming twin of operators/dedup.exact_dedup:
                      incremental groupBy on md5(text), carrying
                      (min doc_id, copies) per distinct text. State is
                      one row per DISTINCT document — the honest cost of
                      exact streaming dedup; swap the md5 key for a
                      minhash band key for approximate near-dup dedup at
                      lower state.

Scale notes: both are keyed streaming aggregations — the only shuffle is
the hash exchange on the dedup key any engine needs. The watermark bound
makes dedup_events O(events inside the watermark window) regardless of
stream length; exact_dedup_stream is O(distinct docs), the same space a
batch groupBy would shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_WATERMARK = "1 hour"


def dedup_events(
    events: DataFrame, watermark: str = DEFAULT_WATERMARK
) -> DataFrame:
    """Keep the first delivery of each event_id; drop replays.

    `dropDuplicatesWithinWatermark` frees an id's state once the
    watermark passes its event time, so duplicate deliveries are only
    suppressed while they can still legally arrive — exactly the
    at-least-once window — and state never grows with history.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def exact_dedup_stream(docs: DataFrame) -> DataFrame:
    """(doc_id, text) stream -> (text_hash, keep_doc_id, n_copies).

    Incremental complete-mode aggregate keyed on the content hash; the
    min/count pair is order-insensitive, so the result equals the batch
    exact_dedup on the same data under any micro-batch split.
    """
    return (
        docs.select(F.col("doc_id"), F.md5("text").alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )

"""Stateful streaming sequence-pattern matcher: per-user MATCH_RECOGNIZE
counts with O(1) state.

The batch operator (plans/timeseries.events_pattern_match) gathers each
user's whole event string and regex-counts it — fine over a table,
impossible over an unbounded stream. This operator carries exactly the
sufficient statistic for both patterns in `applyInPandasWithState`
state: the last TWO event-type initials (enough to recognize the
strict view->click->purchase adjacency when the 'p' arrives) and the
current error-run length (a maximal run of >= 2 errors is counted once,
the moment it reaches length 2). State per user is a 2-char string +
four counters — O(1) regardless of stream length, unlike the
sessionize-class operators whose state is the user's whole window.

Equivalence to the regex twin: 'vcp' has three DISTINCT symbols, so its
non-overlapping occurrences are exactly the 'p' arrivals whose two
predecessors are 'vc'; 'ee+' maximal runs are exactly the moments an
error run reaches length 2. Both engines therefore count identical
events given identical order.

Ordering contract (same class as stateful.rolling_stats_stream): within
a micro-batch the group is sorted by (ts, event_id); across
micro-batches arrival must be non-decreasing in (ts, event_id) — the
seq-ordered landing zone in plans/streaming_queries pins file mtimes in
ts-range order so the file source delivers batches in sequence. Stale
rows at or before the state's high-water (ts, event_id) are dropped
rather than corrupting the sequence (replay safety).

Scale: one hash exchange on user_id (any keyed stateful operator's
floor); Arrow-batched group transfer; emitted rows are one per active
user per micro-batch (running totals), so the sink sees O(users), never
O(events).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("last2", StringType()),
        StructField("err_run", IntegerType()),
        StructField("n_events", LongType()),
        StructField("n_vcp", IntegerType()),
        StructField("n_bursts", IntegerType()),
        StructField("last_ts_us", LongType()),
        StructField("last_event_id", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("n_view_click_purchase", IntegerType()),
        StructField("n_error_bursts", IntegerType()),
        StructField("converted", BooleanType()),
    ]
)


def _seq_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        last2, err_run, n_events, n_vcp, n_bursts, last_ts, last_eid = state.get
    else:
        last2, err_run, n_events, n_vcp, n_bursts, last_ts, last_eid = (
            "", 0, 0, 0, 0, -(2**62), -(2**62),
        )

    chunks = [pdf for pdf in pdfs if len(pdf)]
    emitted = []
    if chunks:
        pdf = pd.concat(chunks).sort_values(["ts", "event_id"])
        for row in pdf.itertuples(index=False):
            ts_us = int(pd.Timestamp(row.ts).value // 1000)
            if (ts_us, int(row.event_id)) <= (last_ts, last_eid):
                continue  # replayed/stale row: sequence already past it
            last_ts, last_eid = ts_us, int(row.event_id)
            c = str(row.event_type)[:1]
            n_events += 1
            if c == "e":
                err_run += 1
                if err_run == 2:
                    n_bursts += 1
            else:
                err_run = 0
            if c == "p" and last2 == "vc":
                n_vcp += 1
            last2 = (last2 + c)[-2:]
        emitted.append(
            {
                "user_id": int(user_id),
                "n_events": n_events,
                "n_view_click_purchase": n_vcp,
                "n_error_bursts": n_bursts,
                "converted": bool(n_vcp > 0),
            }
        )

    state.update(
        (last2, err_run, n_events, n_vcp, n_bursts, last_ts, last_eid)
    )
    yield pd.DataFrame(emitted, columns=[f.name for f in OUTPUT_SCHEMA.fields])


def pattern_match_stream(events: DataFrame) -> DataFrame:
    """(ts, event_id, user_id, event_type) stream -> running per-user
    pattern counts, one row per active user per micro-batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _seq_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

"""Stateful streaming sequence-pattern matcher: per-user MATCH_RECOGNIZE
counts with O(1) state.

The batch operator (plans/timeseries.events_pattern_match) gathers each
user's whole event string and regex-counts it — fine over a table,
impossible over an unbounded stream. This operator carries exactly the
sufficient statistic for both patterns in `applyInPandasWithState`
state: the last TWO event-type initials. That is enough to recognize
the strict view->click->purchase adjacency when the 'p' arrives AND to
know whether an error run crossing the batch boundary was already
counted (`last2 == "ee"` iff the current run already reached length 2).
State per user is a 2-char string + three counters + a replay
watermark — O(1) regardless of stream length, unlike the
sessionize-class operators whose state is the user's whole window.

Equivalence to the regex twin: 'vcp' has three DISTINCT symbols, so its
non-overlapping occurrences are exactly the 'p' arrivals whose two
predecessors are 'vc'; 'ee+' maximal runs are exactly the 'e' positions
whose predecessor is 'e' and pre-predecessor is not. Both engines
therefore count identical events given identical order.

The per-batch work is VECTORIZED: the group's initials become one
numpy char array (prefixed by the state's two context chars, padded
with a sentinel for stream start), and both patterns reduce to
shifted-slice comparisons — no Python loop over events (the r9 first
cut looped itertuples and measured ~5s over 100k events; this form is
milliseconds).

Ordering contract (same class as stateful.rolling_stats_stream): within
a micro-batch the group is sorted by (ts, event_id); across
micro-batches arrival must be non-decreasing in (ts, event_id) — the
seq-ordered landing zone in plans/streaming_queries pins file mtimes in
ts-range order so the file source delivers batches in sequence. Stale
rows at or below the state's high-water (ts, event_id) are dropped
rather than corrupting the sequence (replay safety;
tests/test_streaming.py::test_seqmatch_state_drops_replayed_rows).

Scale: one hash exchange on user_id (any keyed stateful operator's
floor); Arrow-batched group transfer; emitted rows are one per active
user per micro-batch (running totals), so the sink sees O(users), never
O(events).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
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


def _count_patterns(prefix: str, chars: np.ndarray) -> tuple[int, int]:
    """Vectorized pattern counts over ``prefix + chars``: ('v','c','p')
    adjacencies completing at a new char, and 'e'-runs reaching length
    exactly 2 at a new char. ``prefix`` is the state's last two
    initials, left-padded with a sentinel so stream starts behave as
    "no predecessor"."""
    pre = ("xx" + prefix)[-2:]
    a = np.concatenate(
        [np.frombuffer(pre.encode("ascii"), dtype="S1"), chars]
    )
    n_vcp = int(
        ((a[2:] == b"p") & (a[1:-1] == b"c") & (a[:-2] == b"v")).sum()
    )
    n_bursts = int(
        ((a[2:] == b"e") & (a[1:-1] == b"e") & (a[:-2] != b"e")).sum()
    )
    return n_vcp, n_bursts


def _seq_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        last2, n_events, n_vcp, n_bursts, last_ts, last_eid = state.get
    else:
        last2, n_events, n_vcp, n_bursts, last_ts, last_eid = (
            "", 0, 0, 0, -(2**62), -(2**62),
        )

    # This function runs once per (user, micro-batch) — thousands of
    # invocations per drain — so the per-call constant matters as much
    # as the per-event work (guide §4.2). numpy end-to-end: no
    # pd.concat/sort_values (lexsort on the raw arrays), no pandas .str
    # accessor (bytes-dtype cast + reslice).
    chunks = [pdf for pdf in pdfs if len(pdf)]
    emitted = []
    if chunks:
        if len(chunks) == 1:
            pdf = chunks[0]
        else:
            pdf = pd.concat(chunks)
        ts_us = pdf["ts"].to_numpy("datetime64[us]").astype("int64")
        eid = pdf["event_id"].to_numpy("int64")
        order = np.lexsort((eid, ts_us))
        ts_us, eid = ts_us[order], eid[order]
        # replay watermark: keep strictly-after (ts, event_id) rows
        fresh = (ts_us > last_ts) | ((ts_us == last_ts) & (eid > last_eid))
        if fresh.any():
            chars = (
                pdf["event_type"]
                .to_numpy("U1")[order][fresh]
                .astype("S1")
            )
            d_vcp, d_bursts = _count_patterns(last2, chars)
            n_vcp += d_vcp
            n_bursts += d_bursts
            n_events += int(fresh.sum())
            tail = chars[-2:].tobytes().decode("ascii")
            last2 = (last2 + tail)[-2:]
            last_ts = int(ts_us[fresh][-1])
            last_eid = int(eid[fresh][-1])
        emitted.append(
            {
                "user_id": int(user_id),
                "n_events": n_events,
                "n_view_click_purchase": n_vcp,
                "n_error_bursts": n_bursts,
                "converted": bool(n_vcp > 0),
            }
        )

    state.update((last2, n_events, n_vcp, n_bursts, last_ts, last_eid))
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

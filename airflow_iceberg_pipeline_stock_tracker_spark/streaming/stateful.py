"""Custom stateful streaming operator: per-ticker rolling 7-day stats.

The batch cumulate (operators/cumulate.py) recomputes day D from the
(D-7, D] partition slice. In a true stream there is no table to re-read,
so the rolling frame itself becomes keyed state: this operator carries
the last 7 trading days per ticker in `applyInPandasWithState` state and
emits one rolling row per arriving bar — the reference's cumulate
semantics (dag.py:385-437) with O(7) state per key.

Scale: state is bounded at 7 small rows x |tickers| regardless of stream
length; the only shuffle is the hash exchange on ticker that any keyed
stateful operator needs. Data crosses to Python in Arrow batches
(one pandas frame per key per micro-batch), not per-row.

Contract: within a micro-batch rows for one key are processed in date
order; across micro-batches arrival order must be non-decreasing by date
(true for the daily pipeline whose batches are emitted in date order —
see micro_batch.py). Late/replayed days older than the newest state date
are ignored rather than rewriting history.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DateType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ROLLING_DAYS = 7

STATE_SCHEMA = StructType(
    [
        StructField("dates", ArrayType(StringType())),
        StructField("closes", ArrayType(DoubleType())),
        StructField("volumes", ArrayType(LongType())),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("ticker", StringType()),
        StructField("date", DateType()),
        StructField("n_days", IntegerType()),
        StructField("last_7_days_close", ArrayType(DoubleType())),
        StructField("avg_7_day_volume", DoubleType()),
        StructField("volatility_7_day", DoubleType()),
    ]
)


def _rolling_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (ticker,) = key
    if state.exists:
        dates, closes, volumes = state.get
        dates, closes, volumes = list(dates), list(closes), list(volumes)
    else:
        dates, closes, volumes = [], [], []

    out: list[dict] = []
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        # one sorted pass per key per micro-batch: the iterator's Arrow
        # chunk boundaries are arbitrary, so ordering is only defined
        # after concatenating the whole group
        pdf = pd.concat(chunks).sort_values("date")
        for row in pdf.itertuples(index=False):
            ds = row.date.isoformat()
            if dates and ds <= dates[-1]:
                continue  # stale/duplicate day: state already past it
            dates.append(ds)
            closes.append(float(row.close))
            volumes.append(int(row.volume))
            dates, closes, volumes = (
                dates[-ROLLING_DAYS:],
                closes[-ROLLING_DAYS:],
                volumes[-ROLLING_DAYS:],
            )
            closes_s = pd.Series(closes)
            vol = closes_s.std(ddof=1)  # sample stddev, NULL->0 like the batch
            out.append(
                {
                    "ticker": ticker,
                    "date": row.date,
                    "n_days": len(dates),
                    "last_7_days_close": list(closes),
                    "avg_7_day_volume": float(pd.Series(volumes).mean()),
                    "volatility_7_day": 0.0 if pd.isna(vol) else float(vol),
                }
            )

    state.update((dates, closes, volumes))
    yield pd.DataFrame(out, columns=[f.name for f in OUTPUT_SCHEMA.fields])


def rolling_stats_stream(bars: DataFrame) -> DataFrame:
    """(ticker, date, close, volume) stream -> per-bar rolling stats.

    Works on streaming frames (the intended use) and, for parity
    testing, on batch frames via the same groupBy key.
    """
    return bars.groupBy("ticker").applyInPandasWithState(
        _rolling_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

"""Round-13 wave-10 operators: snapshot expiry (retention + orphan
cleanup) and offline binary-segmentation changepoint detection.

Reference scope: expiry completes the emulated-Iceberg capability
matrix (the reference's `USING ICEBERG` tables would run
expire_snapshots on a schedule, /root/reference/dags/dag.py:145);
changepoint is extension tier.
"""

from __future__ import annotations

import datetime as dt
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from airflow_iceberg_pipeline_stock_tracker_spark import pipeline as pl  # noqa: E402
from airflow_iceberg_pipeline_stock_tracker_spark.plans.timeseries import (  # noqa: E402
    changepoint_df,
)
from airflow_iceberg_pipeline_stock_tracker_spark.sources import snapshots  # noqa: E402
from airflow_iceberg_pipeline_stock_tracker_spark.sources.tables import load_table  # noqa: E402


# ---------------------------------------------------------------------------
# prices_snapshot_expire
# ---------------------------------------------------------------------------


def test_expire_lifecycle_end_to_end(spark, tmp_path):
    rows = pl.snapshot_expire_demo(spark, str(tmp_path / "t")).collect()
    assert rows
    for r in rows:
        assert r.n_history_before == 4
        assert r.n_history_after == 2
        assert r.n_dirs_removed == 2
        assert r.expired_unreadable
        assert r.retained_readable
        assert r.orphans_deleted
    # retention must not change the current table: equals the flat
    # 4-day recompute
    from airflow_iceberg_pipeline_stock_tracker_spark.sources.stock_api import (
        DeterministicBarClient,
        bars_to_df,
        fetch_bars,
    )

    client = DeterministicBarClient()
    want = Counter()
    for ds in pl.EXPIRE_DATES:
        for r in bars_to_df(spark, fetch_bars(client, ds)).collect():
            want[r.ticker] += r.volume
    got = {r.ticker: r.sum_volume for r in rows}
    assert got == dict(want)


def test_expire_append_only_history_removes_nothing(spark, tmp_path):
    """Iceberg semantics: in an append-only history every retained
    snapshot still reaches every dir, so vacuum deletes NOTHING even
    while trimming history — the silent-data-loss trap the demo's
    overwrite step exists to avoid."""
    tdir = str(tmp_path / "ap")
    df = spark.range(3).selectExpr("id", "id * 2 AS v")
    for _ in range(3):
        snapshots.commit(df, tdir, mode="append")
    removed = snapshots.vacuum(tdir, keep_last=1)
    assert removed == []
    assert len(snapshots.history(tdir)) == 1
    assert snapshots.read(spark, tdir).count() == 9


# ---------------------------------------------------------------------------
# events_changepoint
# ---------------------------------------------------------------------------


def _python_changepoint(day_counts):
    """Brute-force the argmax split from (date -> y) per the operator's
    definition (split_d = last day of the left segment)."""
    days = sorted(day_counts)
    y = [day_counts[d] for d in days]
    n = len(y)
    tot_s, tot_q = sum(y), sum(v * v for v in y)
    sse_tot = tot_q - tot_s * tot_s / n
    best = None
    s = q = 0
    for i in range(1, n):  # split AFTER index i-1 (i rows left)
        s += y[i - 1]
        q += y[i - 1] * y[i - 1]
        left = q - s * s / i
        rs, rq = tot_s - s, tot_q - q
        right = rq - rs * rs / (n - i)
        gain = sse_tot - left - right
        if best is None or gain > best[1] + 1e-12:
            best = (days[i - 1], gain, s / i, rs / (n - i), i)
    return best


def test_changepoint_matches_python_brute_force(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    counts = {}
    for r in ev.select("event_type", "ts").collect():
        counts.setdefault(r.event_type, Counter())[r.ts.date()] += 1
    got = {r.event_type: r for r in changepoint_df(ev).collect()}
    assert set(got) == set(counts)
    for typ, c in counts.items():
        d, gain, mb, ma, i = _python_changepoint(c)
        r = got[typ]
        assert r.split_d == d, typ
        assert r.i == i
        assert abs(r.gain - gain) < 1e-6 * max(abs(gain), 1.0)
        assert abs(r.mean_before - mb) < 1e-9
        assert abs(r.mean_after - ma) < 1e-9


def test_changepoint_finds_planted_level_shift(spark):
    """2 events/day for 10 days then 10/day for 10 days: the split must
    land exactly on day 10 with means 2 and 10."""
    rows = []
    eid = 0
    base = dt.datetime(2024, 5, 1)
    for day in range(20):
        n = 2 if day < 10 else 10
        for k in range(n):
            rows.append(
                (eid, base + dt.timedelta(days=day, minutes=k), 1, "a", 1.0, "{}")
            )
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    r = changepoint_df(ev).collect()[0]
    assert r.split_d == dt.date(2024, 5, 10)
    assert r.i == 10 and r.n_days == 20
    assert r.mean_before == 2.0 and r.mean_after == 10.0
    # perfect two-level series: gain explains ALL the variance —
    # n * var = 20 * (52 - 36) = 320, both segment SSEs exactly 0
    assert abs(r.gain - 320.0) < 1e-9


# ---------------------------------------------------------------------------
# hypothesis: changepoint vs brute force on random series (incl. gain
# ties, which must break to the earliest date in both)
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# per type: 2-12 days of counts 1-5 (small ints keep the float gains
# exactly reproducible in the python brute force)
_series = st.lists(st.integers(1, 5), min_size=2, max_size=12)


@given(a=_series, b=_series)
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_changepoint_hypothesis_vs_brute_force(spark, a, b):
    rows = []
    eid = 0
    base = dt.datetime(2024, 7, 1)
    for typ, series in (("a", a), ("b", b)):
        for day, n in enumerate(series):
            for k in range(n):
                rows.append(
                    (eid, base + dt.timedelta(days=day, minutes=k), 1, typ, 1.0, "{}")
                )
                eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    got = {r.event_type: r for r in changepoint_df(ev).collect()}
    for typ, series in (("a", a), ("b", b)):
        counts = {
            (base + dt.timedelta(days=i)).date(): n for i, n in enumerate(series)
        }
        d, gain, mb, ma, i = _python_changepoint(counts)
        r = got[typ]
        assert r.split_d == d, (typ, series)
        assert r.i == i
        assert abs(r.gain - gain) < 1e-9
        assert abs(r.mean_before - mb) < 1e-12
        assert abs(r.mean_after - ma) < 1e-12

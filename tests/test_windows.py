"""Windowed-aggregate + FilteredWindowRangeQuery (Q5) tests — the
query type the reference declared but never wired
(``store/CustomQueryStore.java:60-64``), implemented for real here.
"""

import datetime as dt

import pytest

from kafkastreamsinteractivequeries_spark.operators.windows import (
    session_aggregate,
    windowed_aggregate,
)
from kafkastreamsinteractivequeries_spark.plans.queries import FilteredWindowRangeQuery
from kafkastreamsinteractivequeries_spark.schemas import STOCK_TRANSACTION_SCHEMA

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


@pytest.fixture(scope="module")
def txns(spark):
    rows = [
        # hour 0: CFLT buys 1000, sells 500
        ("CFLT", True, 1000.0, 10, T0 + dt.timedelta(minutes=5)),
        ("CFLT", False, 500.0, 10, T0 + dt.timedelta(minutes=50)),
        # hour 1: CFLT sells only
        ("CFLT", False, 800.0, 5, T0 + dt.timedelta(hours=1, minutes=10)),
        # hour 0: MSFT
        ("MSFT", True, 100.0, 1, T0 + dt.timedelta(minutes=30)),
        # hour 3: MSFT
        ("MSFT", True, 900.0, 9, T0 + dt.timedelta(hours=3, minutes=1)),
    ]
    return spark.createDataFrame(rows, STOCK_TRANSACTION_SCHEMA)


def test_tumbling_window_boundaries(txns):
    agg = windowed_aggregate(txns, "1 hour")
    rows = {(r.window_start, r.symbol): (r.buys, r.sells) for r in agg.collect()}
    assert rows[(T0, "CFLT")] == (1000.0, 500.0)
    assert rows[(T0 + dt.timedelta(hours=1), "CFLT")] == (0.0, 800.0)
    assert rows[(T0, "MSFT")] == (100.0, 0.0)
    # window_end is exclusive-start-of-next: start + duration
    ends = {r.window_end - r.window_start for r in agg.collect()}
    assert ends == {dt.timedelta(hours=1)}


def test_hopping_window(txns):
    agg = windowed_aggregate(txns, "2 hours", slide="1 hour")
    # the hour-1 CFLT record falls in windows [0,2) and [1,3)
    cflt = [r for r in agg.collect() if r.symbol == "CFLT"]
    starts = {r.window_start for r in cflt if r.sells >= 800.0}
    assert T0 in starts and (T0 + dt.timedelta(hours=1)) in starts


def test_session_window(txns):
    agg = session_aggregate(txns, "30 minutes")
    msft = sorted(
        (r for r in agg.collect() if r.symbol == "MSFT"), key=lambda r: r.window_start
    )
    # two sessions: hour-0 record and hour-3 record (> 30 min gap)
    assert len(msft) == 2


def test_filtered_window_range_query(txns):
    agg = windowed_aggregate(txns, "1 hour")
    q = FilteredWindowRangeQuery.with_bounds(
        T0, T0 + dt.timedelta(hours=2)
    ).predicate("@.buys > @.sells")
    got = {(r.window_start, r.symbol) for r in q.apply(agg).collect()}
    # hour-3 MSFT window excluded by time bound; hour-1 CFLT by predicate
    assert got == {(T0, "CFLT"), (T0, "MSFT")}


def test_filtered_window_range_no_predicate(txns):
    agg = windowed_aggregate(txns, "1 hour")
    q = FilteredWindowRangeQuery.with_bounds(T0, T0 + dt.timedelta(hours=1))
    got = {(r.window_start, r.symbol) for r in q.apply(agg).collect()}
    assert got == {(T0, "CFLT"), (T0, "MSFT")}


def test_event_sessions_gap_boundary(spark):
    """An event at exactly session_end (= last + gap) opens a NEW
    session; one strictly inside the gap extends it."""
    import datetime as dt

    from kafkastreamsinteractivequeries_spark.operators.windows import event_sessions

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("u1", t0, 1.0),
        ("u1", t0 + dt.timedelta(minutes=29, seconds=59), 2.0),  # extends
        ("u1", t0 + dt.timedelta(minutes=59, seconds=59) + dt.timedelta(minutes=30), 4.0),  # exactly at new end → new session
        ("u2", t0, 8.0),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, value double")
    out = {
        (r.user_id, r.session_start): r
        for r in event_sessions(df, gap="30 minutes").collect()
    }
    s1 = out[("u1", t0)]
    assert s1.n_events == 2 and s1.total_value == 3.0
    assert s1.session_end == t0 + dt.timedelta(minutes=59, seconds=59)
    t2 = t0 + dt.timedelta(minutes=89, seconds=59)
    s2 = out[("u1", t2)]
    assert s2.n_events == 1 and s2.session_end == t2 + dt.timedelta(minutes=30)
    assert out[("u2", t0)].n_events == 1

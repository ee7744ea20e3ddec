"""Unit tests for the as-of join operator (union + window plan)."""

import datetime as dt

from kafkastreamsinteractivequeries_spark.operators.analytics import asof_join


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts(10)), (2, "u1", _ts(5)), (3, "u2", _ts(10)), (4, "u3", _ts(1))],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, "u1", _ts(5), 1.0),   # exactly at left#2 ts → matches (<=)
            (101, "u1", _ts(7), 2.0),   # latest before left#1
            (102, "u2", _ts(10), 3.0),  # tie on ts with #103
            (103, "u2", _ts(10), 4.0),  # higher event_id wins the tie
            (104, "u2", _ts(11), 5.0),  # after left#3 → never matches
        ],
        "event_id long, user_id string, ts timestamp, value double",
    )
    out = asof_join(
        left, right, on="user_id", left_time="ts", right_time="ts",
        right_payload=["event_id", "value"], right_order="event_id",
    )
    got = {r.event_id: (r.r_event_id, r.r_value) for r in out.collect()}
    assert got[1] == (101, 2.0)   # latest strictly-before click
    assert got[2] == (100, 1.0)   # equal timestamps match (<= bound)
    assert got[3] == (103, 4.0)   # ts tie → highest right_order
    assert got[4] == (None, None) # left-asof: no prior right row → NULLs
    assert len(got) == 4          # every left row survives


def test_asof_single_shuffle_per_side(spark):
    left = spark.range(10).selectExpr(
        "id AS event_id", "CAST(id % 3 AS STRING) AS user_id",
        "timestamp'2024-01-01' + make_interval(0,0,0,0,0,CAST(id AS INT),0) AS ts",
    )
    out = asof_join(
        left, left, on="user_id", left_time="ts", right_time="ts",
        right_payload=["event_id"], right_order="event_id",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one hash-partition exchange for the window (plus AQE reads) — and
    # crucially NO join operator at all: the as-of is a window pass
    assert "Join" not in plan

"""Tests for operators/dimensions.py (SCD Type 2)."""

import datetime as dt

from pyspark.sql import functions as F

from kafkastreamsinteractivequeries_spark.operators.dimensions import (
    asof_lookup,
    scd2_init,
    scd2_merge,
)

T0 = dt.datetime(2024, 1, 1)


def _day(n):
    return T0 + dt.timedelta(days=n)


def test_scd2_merge_closes_changed_and_inserts_new(spark):
    dim = scd2_init(
        spark.createDataFrame(
            [(1, "gold"), (2, "silver")], "cust long, segment string"
        ),
        _day(0),
        key_col="cust",
    )
    updates = spark.createDataFrame(
        [
            (1, "platinum", _day(5)),  # changed → close + insert
            (2, "silver", _day(5)),    # unchanged → no-op
            (3, "bronze", _day(5)),    # new key → insert
        ],
        "cust long, segment string, effective_ts timestamp",
    )
    out = scd2_merge(dim, updates, "cust", ["segment"])
    rows = {(r.cust, r.segment, r.is_current): r for r in out.collect()}
    assert len(rows) == 4
    old1 = rows[(1, "gold", False)]
    assert old1.valid_to == _day(5)
    new1 = rows[(1, "platinum", True)]
    assert new1.valid_from == _day(5) and new1.valid_to is None
    assert rows[(2, "silver", True)].valid_from == _day(0)  # untouched
    assert rows[(3, "bronze", True)].valid_from == _day(5)


def test_scd2_merge_is_idempotent_on_redelivery(spark):
    dim = scd2_init(
        spark.createDataFrame([(1, "gold")], "cust long, segment string"),
        _day(0),
        key_col="cust",
    )
    updates = spark.createDataFrame(
        [(1, "platinum", _day(3))], "cust long, segment string, effective_ts timestamp"
    )
    once = scd2_merge(dim, updates, "cust", ["segment"])
    twice = scd2_merge(once, updates, "cust", ["segment"])
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b  # re-delivering the same batch changes nothing


def test_scd2_latest_update_in_batch_wins(spark):
    dim = scd2_init(
        spark.createDataFrame([(1, "gold")], "cust long, segment string"),
        _day(0),
        key_col="cust",
    )
    updates = spark.createDataFrame(
        [(1, "silver", _day(2)), (1, "platinum", _day(4))],
        "cust long, segment string, effective_ts timestamp",
    )
    out = scd2_merge(dim, updates, "cust", ["segment"]).collect()
    current = [r for r in out if r.is_current]
    assert len(current) == 1 and current[0].segment == "platinum"
    assert current[0].valid_from == _day(4)


def test_asof_lookup_picks_the_version_valid_at_fact_time(spark):
    dim = scd2_init(
        spark.createDataFrame([(1, "gold")], "cust long, segment string"),
        _day(0),
        key_col="cust",
    )
    dim = scd2_merge(
        dim,
        spark.createDataFrame(
            [(1, "platinum", _day(10))],
            "cust long, segment string, effective_ts timestamp",
        ),
        "cust",
        ["segment"],
    )
    facts = spark.createDataFrame(
        [(100, 1, _day(5)), (101, 1, _day(10)), (102, 1, _day(20)), (103, 9, _day(5))],
        "order_id long, cust long, order_ts timestamp",
    )
    out = {r.order_id: r.segment for r in asof_lookup(facts, dim, "cust", "order_ts").collect()}
    assert out[100] == "gold"       # before the change
    assert out[101] == "platinum"   # boundary: new version effective AT its ts
    assert out[102] == "platinum"
    assert out[103] is None         # unknown key → left join null


def test_scd2_rejects_unpopulated_payload_columns(spark):
    import pytest

    dim = scd2_init(
        spark.createDataFrame(
            [(1, "gold", "extra")], "cust long, segment string, note string"
        ),
        _day(0),
        key_col="cust",
    )
    updates = spark.createDataFrame(
        [(1, "silver", _day(1))], "cust long, segment string, effective_ts timestamp"
    )
    with pytest.raises(ValueError, match="non-attribute payload"):
        scd2_merge(dim, updates, "cust", ["segment"])


def test_scd2_drops_stale_out_of_order_batch(spark):
    # An update batch whose effective_ts predates (or equals) the open
    # row's valid_from is a late replay of history: applying it would
    # close the open row with valid_to < valid_from and insert a
    # backwards "current" version.  It must be a no-op instead.
    dim = scd2_init(
        spark.createDataFrame([(1, "gold")], "cust long, segment string"),
        _day(10),
        key_col="cust",
    )
    stale = spark.createDataFrame(
        [(1, "bronze", _day(3))], "cust long, segment string, effective_ts timestamp"
    )
    out = scd2_merge(dim, stale, "cust", ["segment"]).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.segment, r.is_current, r.valid_from, r.valid_to) == (
        "gold", True, _day(10), None,
    )
    # equal-ts is also stale (a transition needs strictly-later time)
    same_ts = spark.createDataFrame(
        [(1, "bronze", _day(10))], "cust long, segment string, effective_ts timestamp"
    )
    out2 = scd2_merge(dim, same_ts, "cust", ["segment"]).collect()
    assert len(out2) == 1 and out2[0].segment == "gold" and out2[0].is_current
    # validity ranges never go backwards after any merge
    for r in out + out2:
        assert r.valid_to is None or r.valid_to > r.valid_from

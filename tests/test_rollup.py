"""Mergeable partial aggregates: merged state must equal direct
aggregation exactly (counts/min/max/register tables) or to float
tolerance (double sums), at every grain."""

import pytest
from pyspark.sql import functions as F

from kafkastreamsinteractivequeries_spark.operators import rollup as R
from kafkastreamsinteractivequeries_spark.operators import sketches as SK
from kafkastreamsinteractivequeries_spark.sources.tables import (
    load_table,
    transactions_from_events,
)

MEASURES = {"amount": ["sum", "min", "max", "sumsq"], "number_shares": ["sum"]}


@pytest.fixture(scope="module")
def txns(spark, sf_dir):
    return transactions_from_events(load_table(spark, sf_dir, "events")).cache()


def _direct(txns, *groups):
    return {
        tuple(r[g] for g in groups): r
        for r in txns.groupBy(
            *[F.col(g) for g in groups]
        )
        .agg(
            F.count("*").alias("n"),
            F.sum("amount").alias("s"),
            F.min("amount").alias("mn"),
            F.max("amount").alias("mx"),
            F.sum("number_shares").alias("sh"),
        )
        .collect()
    }


def test_merge_day_equals_direct_day(txns):
    hourly = R.partial_aggregate(txns, ["symbol"], "event_time", "hour", MEASURES)
    daily = R.merge_partials(hourly, ["symbol"], grain="day")
    direct = {
        (r["symbol"], r["d"]): r
        for r in txns.withColumn("d", F.date_trunc("day", "event_time"))
        .groupBy("symbol", "d")
        .agg(
            F.count("*").alias("n"),
            F.sum("amount").alias("s"),
            F.min("amount").alias("mn"),
            F.max("amount").alias("mx"),
            F.sum("number_shares").alias("sh"),
        )
        .collect()
    }
    rolled = daily.collect()
    assert len(rolled) == len(direct)
    for r in rolled:
        d = direct[(r["symbol"], r["bucket"])]
        assert r["_n"] == d["n"]
        assert r["amount_min"] == d["mn"] and r["amount_max"] == d["mx"]
        assert r["number_shares_sum"] == d["sh"]
        assert abs(r["amount_sum"] - d["s"]) < 1e-6 * max(1.0, abs(d["s"]))


def test_merge_to_all_time_drops_bucket(txns):
    hourly = R.partial_aggregate(txns, ["symbol"], "event_time", "hour", MEASURES)
    alltime = R.merge_partials(hourly, ["symbol"], grain=None)
    assert "bucket" not in alltime.columns
    direct = _direct(txns, "symbol")
    rows = alltime.collect()
    assert len(rows) == len(direct)
    for r in rows:
        d = direct[(r["symbol"],)]
        assert r["_n"] == d["n"] and r["amount_min"] == d["mn"]


def test_merge_is_associative_across_increments(txns):
    """Partials from two disjoint ingest increments union+merge to the
    same state as partials over the whole — the landed-increment
    contract."""
    a = txns.filter(F.col("buy"))
    b = txns.filter(~F.col("buy"))
    inc = R.merge_partials(
        R.partial_aggregate(a, ["symbol"], "event_time", "hour", MEASURES).unionByName(
            R.partial_aggregate(b, ["symbol"], "event_time", "hour", MEASURES)
        ),
        ["symbol"],
        grain=None,
    )
    whole = R.merge_partials(
        R.partial_aggregate(txns, ["symbol"], "event_time", "hour", MEASURES),
        ["symbol"],
        grain=None,
    )
    ai = {r["symbol"]: r for r in inc.collect()}
    aw = {r["symbol"]: r for r in whole.collect()}
    assert set(ai) == set(aw)
    for k, r in aw.items():
        assert ai[k]["_n"] == r["_n"]
        assert ai[k]["amount_min"] == r["amount_min"]
        assert ai[k]["amount_max"] == r["amount_max"]
        assert abs(ai[k]["amount_sumsq"] - r["amount_sumsq"]) < 1e-6 * max(
            1.0, abs(r["amount_sumsq"])
        )


def test_finalize_mean_var_match_direct(txns):
    merged = R.merge_partials(
        R.partial_aggregate(txns, ["symbol"], "event_time", "hour", MEASURES),
        ["symbol"],
        grain=None,
    )
    fin = {
        r["symbol"]: r
        for r in R.finalize(merged, mean_of=["amount"], var_of=["amount"]).collect()
    }
    direct = {
        r["symbol"]: r
        for r in txns.groupBy("symbol")
        .agg(F.avg("amount").alias("avg"), F.var_pop("amount").alias("var"))
        .collect()
    }
    for k, d in direct.items():
        assert fin[k]["amount_avg"] == pytest.approx(d["avg"], rel=1e-9)
        assert fin[k]["amount_var"] == pytest.approx(d["var"], rel=1e-6)


def test_unmergeable_suffix_raises(txns):
    bad = R.partial_aggregate(
        txns, ["symbol"], "event_time", "hour", {"amount": ["sum"]}
    ).withColumnRenamed("amount_sum", "amount_avg")
    with pytest.raises(ValueError, match="amount_avg"):
        R.merge_partials(bad, ["symbol"], grain=None)


def test_hll_register_merge_equals_direct_registers(spark, sf_dir):
    """Hour-grain register tables merged down to symbol are row-identical
    to registers built in one direct pass — the merge is exact, so the
    estimates are too."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "hour", F.date_trunc("hour", "ts")
    )
    fine = SK.hll_registers(ev, "user_id", ["event_type", "hour"], p=6)
    merged = R.merge_hll_registers(fine, ["event_type"])
    direct = SK.hll_registers(ev, "user_id", ["event_type"], p=6)
    m = {(r["event_type"], r["bucket"]): r["reg"] for r in merged.collect()}
    d = {(r["event_type"], r["bucket"]): r["reg"] for r in direct.collect()}
    assert m == d


def test_rolled_lineage_shuffle_count(txns):
    """The rolled plan (raw → hour partials → day merge) carries exactly
    two exchanges: one per aggregation level.  At 100 TB level one runs
    at ingest and lands; level two touches only the landed partials."""
    daily = R.merge_partials(
        R.partial_aggregate(txns, ["symbol"], "event_time", "hour", MEASURES),
        ["symbol"],
        grain="day",
    )
    plan = daily._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 2

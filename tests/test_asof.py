"""Unit tests for the as-of join operator (union + window plan)."""

import datetime as dt

import pytest

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


def test_funnel_analysis_orders_and_bounds_steps(spark):
    import datetime as dt

    from kafkastreamsinteractivequeries_spark.operators.analytics import (
        funnel_analysis,
    )

    T0 = dt.datetime(2024, 1, 1)
    h = dt.timedelta(hours=1)
    rows = [
        # user 1: full ordered funnel
        (1, "signup", T0), (1, "activate", T0 + h), (1, "purchase", T0 + 2 * h),
        # user 2: activate BEFORE signup → only step 1 counts
        (2, "activate", T0), (2, "signup", T0 + h),
        # user 3: signup + activate, purchase outside the horizon
        (3, "signup", T0), (3, "activate", T0 + h),
        (3, "purchase", T0 + dt.timedelta(days=30)),
        # user 4: irrelevant events only
        (4, "view", T0),
        # user 5: repeated steps — first occurrences drive the chain
        (5, "signup", T0), (5, "signup", T0 + 5 * h),
        (5, "activate", T0 + h), (5, "purchase", T0 + 2 * h),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    out = {
        r.user_id: r
        for r in funnel_analysis(
            df, ["signup", "activate", "purchase"], horizon_days=7.0
        ).collect()
    }
    assert out[1].steps_completed == 3
    assert out[2].steps_completed == 1
    assert out[3].steps_completed == 2  # purchase past the horizon
    assert 4 not in out  # never entered the funnel
    assert out[5].steps_completed == 3  # first signup chains cleanly
    assert out[5].step_1_ts == T0


def test_funnel_requires_two_steps(spark):
    import pytest as _pytest

    from kafkastreamsinteractivequeries_spark.operators.analytics import (
        funnel_analysis,
    )

    df = spark.createDataFrame([], "user_id long, event_type string, ts timestamp")
    with _pytest.raises(ValueError):
        funnel_analysis(df, ["only"])


def test_cohort_retention_triangle(spark):
    import datetime as dt

    from kafkastreamsinteractivequeries_spark.operators.analytics import (
        cohort_retention,
    )

    # Mondays: 2024-01-01 and 2024-01-08
    w0, w1, w2 = (dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 8),
                  dt.datetime(2024, 1, 15))
    rows = [
        (1, w0), (1, w1), (1, w2),   # cohort w0, active all three weeks
        (2, w0), (2, w2),            # cohort w0, skips week 1
        (3, w1),                     # cohort w1, one week only
        (1, w0 + dt.timedelta(hours=5)),  # duplicate within a period
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        (r.cohort, r.periods_since): r.n_active
        for r in cohort_retention(df, period="week").collect()
    }
    cohorts = sorted({c for c, _ in out})
    c0, c1 = cohorts[0], cohorts[1]
    assert c1 == c0 + 1
    assert out[(c0, 0)] == 2  # users 1, 2 in week 0
    assert out[(c0, 1)] == 1  # only user 1 in week 1
    assert out[(c0, 2)] == 2  # users 1, 2 back in week 2
    assert out[(c1, 0)] == 1  # user 3's own cohort
    assert (c1, 1) not in out


@pytest.mark.slow  # >10 s; runs in the full suite
def test_interval_join_matches_naive_and_avoids_nested_loop(spark):
    import datetime as dt

    from pyspark.sql import functions as F

    from kafkastreamsinteractivequeries_spark.operators.analytics import interval_join

    T0 = dt.datetime(2024, 1, 1)
    mins = lambda m: T0 + dt.timedelta(minutes=m)
    points = spark.createDataFrame(
        [(i, mins(i * 7)) for i in range(200)], "point_id long, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [
            (100, mins(0), mins(30)),        # short
            (101, mins(25), mins(26)),       # sub-bucket
            (102, mins(100), mins(500)),     # spans many buckets
            (103, mins(1390), mins(1400)),   # near the end
            (104, mins(2000), mins(2001)),   # past every point
        ],
        "iv_id long, start_ts timestamp, end_ts timestamp",
    )
    got = {
        (r.point_id, r.iv_id)
        for r in interval_join(points, intervals, bucket_seconds=600).collect()
    }
    naive = {
        (r.point_id, r.iv_id)
        for r in points.join(
            intervals,
            (F.col("ts") >= F.col("start_ts")) & (F.col("ts") < F.col("end_ts")),
        ).collect()
    }
    assert got == naive and len(got) > 0
    # each qualifying pair appears exactly once (no dedup stage needed)
    rows = interval_join(points, intervals, bucket_seconds=600).count()
    assert rows == len(got)
    # the whole point: an equi-join plan, not a nested loop / cartesian
    plan = (
        interval_join(points, intervals, bucket_seconds=600)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_interval_join_boundary_semantics(spark):
    import datetime as dt

    from kafkastreamsinteractivequeries_spark.operators.analytics import interval_join

    T0 = dt.datetime(2024, 1, 1)
    points = spark.createDataFrame(
        [(1, T0), (2, T0 + dt.timedelta(hours=1))], "point_id long, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [(9, T0, T0 + dt.timedelta(hours=1))],
        "iv_id long, start_ts timestamp, end_ts timestamp",
    )
    got = {
        (r.point_id, r.iv_id) for r in interval_join(points, intervals).collect()
    }
    assert got == {(1, 9)}  # start inclusive, end exclusive


def test_skew_report_surfaces_heavy_keys(spark):
    from pyspark.sql import functions as F

    from kafkastreamsinteractivequeries_spark.operators.analytics import skew_report

    # key 7 holds half the table; everything else is uniform
    df = spark.range(10_000).select(
        F.when(F.col("id") < 5_000, 7).otherwise(F.col("id") % 100).alias("k")
    )
    out = skew_report(df, ["k"], top_k=3).collect()
    assert out[0].k == 7 and out[0].n_rows >= 5_000
    assert abs(out[0].share - out[0].n_rows / 10_000) < 1e-9
    assert out[0].total_rows == 10_000
    # plan: global top-k must be heap-based, not a full sort
    plan = skew_report(df, ["k"])._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_salted_join_matches_plain_join(spark):
    from pyspark.sql import functions as F

    from kafkastreamsinteractivequeries_spark.operators.analytics import salted_join

    # one hot key (7) holding half the fact side
    facts = spark.range(20_000).select(
        F.when(F.col("id") < 10_000, 7).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(50).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), "id").alias("attr")
    )
    plain = {
        (r.k, r.payload, r.attr)
        for r in facts.join(dim, ["k"], "inner").collect()
    }
    salted = {
        (r.k, r.payload, r.attr)
        for r in salted_join(facts, dim, ["k"], salt=8).collect()
    }
    assert salted == plain and len(salted) == 20_000

    # left join: unmatched keys survive with nulls
    dim_partial = dim.filter(F.col("k") < 10)
    plain_left = {
        (r.k, r.payload, r.attr)
        for r in facts.join(dim_partial, ["k"], "left").collect()
    }
    salted_left = {
        (r.k, r.payload, r.attr)
        for r in salted_join(facts, dim_partial, ["k"], how="left", salt=8).collect()
    }
    assert salted_left == plain_left


def test_salted_join_spreads_hot_key_across_salts(spark):
    from pyspark.sql import functions as F

    from kafkastreamsinteractivequeries_spark.operators.analytics import salted_join

    facts = spark.range(10_000).select(F.lit(7).alias("k"), F.col("id").alias("p"))
    s = facts.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in facts.columns]), F.lit(8))
    )
    n_salts = s.select("_salt").distinct().count()
    assert n_salts == 8  # the hot key's rows really do spread


def test_funnel_handles_ntz_timestamps(spark):
    # the nanos-parquet loader yields TIMESTAMP_NTZ, which cannot
    # cast("long") — the horizon arithmetic must go through
    # unix_timestamp (regression: DATATYPE_MISMATCH on real testdata)
    from pyspark.sql import functions as F

    from kafkastreamsinteractivequeries_spark.operators.analytics import (
        funnel_analysis,
    )

    df = spark.createDataFrame(
        [(1, "a", "2024-01-01 00:00:00"), (1, "b", "2024-01-01 01:00:00")],
        "user_id long, event_type string, raw string",
    ).select("user_id", "event_type", F.to_timestamp_ntz("raw").alias("ts"))
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    out = funnel_analysis(df, ["a", "b"], horizon_days=1.0).collect()
    assert out[0].steps_completed == 2


def test_asof_forward_and_tolerance_semantics(spark):
    """Forward as-of: EARLIEST right at-or-after, ties to the lowest
    order key.  Tolerance: the nearest match is nulled (not replaced)
    when it lies beyond the window — pandas merge_asof semantics."""
    import datetime as dt

    from kafkastreamsinteractivequeries_spark.operators.analytics import asof_join

    t0 = dt.datetime(2024, 1, 1)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    left = spark.createDataFrame(
        [(1, ts(10)), (1, ts(100)), (2, ts(50))], "k long, lt timestamp"
    )
    right = spark.createDataFrame(
        [
            (1, ts(10), 7, "at"),       # exactly at left#1 (inclusive)
            (1, ts(10), 3, "at_low"),   # same ts, LOWER order key
            (1, ts(30), 9, "later"),
            (2, ts(80), 1, "far"),      # 30 min after left, beyond 20-min tol
        ],
        "k long, rt timestamp, o long, tag string",
    )

    fwd = {
        (r.k, r.lt): r.m_tag
        for r in asof_join(
            left, right, on="k", left_time="lt", right_time="rt",
            right_payload=["tag"], right_order="o", prefix="m_",
            direction="forward",
        ).collect()
    }
    # inclusive at-or-after; equal-ts tie goes to the LOWEST order key
    assert fwd[(1, ts(10))] == "at_low"
    assert fwd[(1, ts(100))] is None  # nothing after
    assert fwd[(2, ts(50))] == "far"

    tol = {
        (r.k, r.lt): r.m_tag
        for r in asof_join(
            left, right, on="k", left_time="lt", right_time="rt",
            right_payload=["tag"], right_order="o", prefix="m_",
            direction="forward", tolerance_seconds=20 * 60,
        ).collect()
    }
    # the row survives, its match is nulled (beyond the window)
    assert tol[(2, ts(50))] is None
    assert tol[(1, ts(10))] == "at_low"

    bwd_tol = {
        (r.k, r.lt): r.m_tag
        for r in asof_join(
            left, right, on="k", left_time="lt", right_time="rt",
            right_payload=["tag"], right_order="o", prefix="m_",
            direction="backward", tolerance_seconds=20 * 60,
        ).collect()
    }
    # backward from ts(100): nearest is ts(30), 70 min back -> nulled
    assert bwd_tol[(1, ts(100))] is None
    # backward from ts(10): equal-ts tie goes to the HIGHEST order key
    assert bwd_tol[(1, ts(10))] == "at"

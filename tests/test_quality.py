"""Tests for operators/quality.py (single-pass constraint suite)."""

import pytest
from pyspark.sql import functions as F

from kafkastreamsinteractivequeries_spark.operators.quality import (
    assert_constraints,
    check_constraints,
)


def _report(df, rules):
    return {
        (r.rule, r.column): (r.violations, r.total_rows, r.passed)
        for r in check_constraints(df, rules).collect()
    }


def test_scalar_rules_one_pass(spark):
    df = spark.createDataFrame(
        [
            (1, "a@x.io", 10.0),
            (2, None, 150.0),      # null email, out-of-range amount
            (3, "bad", 50.0),      # malformed email
            (None, "c@y.io", 20.0),  # null id
        ],
        "id long, email string, amount double",
    )
    rules = [
        ("not_null", "id"),
        ("not_null", "email"),
        ("range", "amount", 0, 100),
        ("matches", "email", r"[^@]+@[^@]+\.[^@]+"),
        ("expr", "amount_vs_id", "amount IS NULL OR amount > 0"),
    ]
    rep = _report(df, rules)
    assert rep[("not_null", "id")] == (1, 4, False)
    assert rep[("not_null", "email")] == (1, 4, False)
    assert rep[("range", "amount")] == (1, 4, False)
    assert rep[("matches", "email")] == (2, 4, False)  # null fails too
    assert rep[("expr", "amount_vs_id")] == (0, 4, True)
    # one aggregate job for the whole scalar suite: the plan holds a
    # single pair of HashAggregates over the scan
    plan = (
        check_constraints(df, rules[:4])._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan") <= 4  # unioned 1-row projections, not re-scans


def test_unique_rule(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b"), (3, "b")], "k long, v string"
    )
    rep = _report(df, [("unique", ["k"]), ("unique", ["k", "v"])])
    assert rep[("unique", "k")] == (2, 4, False)  # the two k=1 rows
    assert rep[("unique", "k,v")] == (2, 4, False)
    clean = spark.createDataFrame([(1,), (2,)], "k long")
    assert _report(clean, [("unique", ["k"])])[("unique", "k")] == (0, 2, True)


def test_assert_constraints_gate(spark):
    df = spark.createDataFrame([(1,), (None,)], "id long")
    with pytest.raises(ValueError, match=r"not_null\(id\): 1/2"):
        assert_constraints(df, [("not_null", "id")])
    assert_constraints(df.filter(F.col("id").isNotNull()), [("not_null", "id")])


def test_testdata_tables_pass_their_contracts(spark, sf_dir):
    from kafkastreamsinteractivequeries_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events")
    assert_constraints(
        events,
        [
            ("not_null", "event_id"),
            ("unique", ["event_id"]),
            ("in_set", "event_type", ["click", "view", "purchase", "signup", "error"]),
            ("expr", "value_nonneg", "value IS NULL OR value >= 0"),
        ],
    )


def test_expr_rule_counts_null_predicate_as_violation(spark):
    # "NULLs don't pass" must hold for expr rules too: a bare ~expr is
    # NULL for NULL inputs and when(NULL, 1) silently yields 0.
    from kafkastreamsinteractivequeries_spark.operators.quality import (
        check_constraints,
    )

    df = spark.createDataFrame(
        [(1.0,), (None,), (-2.0,), (3.0,)], "amount double"
    )
    rows = {
        r.rule: r
        for r in check_constraints(df, [("expr", "amt_pos", "amount > 0")]).collect()
    }
    r = rows["expr"]
    assert r.violations == 2  # the NULL row AND the negative row
    assert not r.passed

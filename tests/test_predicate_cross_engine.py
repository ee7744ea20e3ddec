"""Cross-engine property test for the raw-JSON predicate mode: random
predicates evaluated by `compile_predicate(src, json_col=...)` on Spark
(get_json_object + casts) must match DuckDB evaluating the equivalent
SQL over json_extract_string on the SAME json strings — pinning the
raw-JSON mode the way the typed mode is pinned by the golden +
hypothesis suites (reference semantics:
store/CustomQueryStore.java:68-97 via com.jayway.jsonpath).

Both engines share Kleene three-valued logic for null propagation, so
every generated shape (including != / ! / missing keys) must agree on
the exact matched-row set.
"""

import json

import duckdb
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from kafkastreamsinteractivequeries_spark.functions.predicate import (
    compile_predicate,
)

# Fixture rows: numeric fields, a string key, a boolean, and a 'note'
# field MISSING on some rows (exercises get_json_object's null-on-
# missing against DuckDB's).
ROWS = [
    {"id": 0, "symbol": "CFLT", "buys": 300, "sells": 200, "flag": True},
    {"id": 1, "symbol": "GOOGL", "buys": 12.5, "sells": 12.5, "flag": False,
     "note": "a"},
    {"id": 2, "symbol": "MSFT", "buys": 0, "sells": 150, "flag": True},
    {"id": 3, "symbol": "ZELK", "buys": -7, "sells": 0.25, "flag": False,
     "note": "b"},
    {"id": 4, "symbol": "AAPL", "buys": 299, "sells": 300, "flag": True},
    {"id": 5, "symbol": "CFLT", "buys": 300.5, "sells": 299.5, "flag": False},
]

NUM_FIELDS = ["buys", "sells"]
CMP_OPS = ["==", "!=", ">", ">=", "<", "<="]
SYMBOLS = ["CFLT", "GOOGL", "MSFT", "ZELK", "AAPL", "NOPE"]
NUM_LITS = [-10, 0, 0.25, 12.5, 150, 299, 300, 300.5, 400]

_leaf = st.one_of(
    st.tuples(st.just("num_lit"), st.sampled_from(NUM_FIELDS),
              st.sampled_from(CMP_OPS), st.sampled_from(NUM_LITS)),
    st.tuples(st.just("num_num"), st.sampled_from(NUM_FIELDS),
              st.sampled_from(CMP_OPS), st.sampled_from(NUM_FIELDS)),
    st.tuples(st.just("str_lit"), st.just("symbol"),
              st.sampled_from(["==", "!=", ">", "<"]),
              st.sampled_from(SYMBOLS)),
    st.tuples(st.just("bool_lit"), st.just("flag"),
              st.sampled_from(["==", "!="]), st.booleans()),
    st.tuples(st.just("null_cmp"), st.sampled_from(["note", "symbol"]),
              st.sampled_from(["==", "!="])),
)
_ast = st.recursive(
    _leaf,
    lambda kids: st.one_of(
        st.tuples(st.just("and"), kids, kids),
        st.tuples(st.just("or"), kids, kids),
        st.tuples(st.just("not"), kids),
    ),
    max_leaves=5,
)


def _num_sql(field: str) -> str:
    return f"CAST(json_extract_string(value, '$.{field}') AS DOUBLE)"


_SQL_OP = {"==": "=", "!=": "!="}


def _render(node) -> tuple[str, str]:
    """AST → (jsonpath predicate, DuckDB WHERE clause)."""
    kind = node[0]
    if kind == "and":
        lp, ls = _render(node[1])
        rp, rs = _render(node[2])
        return f"({lp} && {rp})", f"({ls} AND {rs})"
    if kind == "or":
        lp, ls = _render(node[1])
        rp, rs = _render(node[2])
        return f"({lp} || {rp})", f"({ls} OR {rs})"
    if kind == "not":
        ip, isq = _render(node[1])
        return f"!({ip})", f"(NOT ({isq}))"
    if kind == "num_lit":
        _, f_, op, lit = node
        return (
            f"@.{f_} {op} {lit}",
            f"{_num_sql(f_)} {_SQL_OP.get(op, op)} {lit}",
        )
    if kind == "num_num":
        _, a, op, b = node
        return (
            f"@.{a} {op} @.{b}",
            f"{_num_sql(a)} {_SQL_OP.get(op, op)} {_num_sql(b)}",
        )
    if kind == "str_lit":
        _, f_, op, lit = node
        return (
            f"@.{f_} {op} '{lit}'",
            f"json_extract_string(value, '$.{f_}') "
            f"{_SQL_OP.get(op, op)} '{lit}'",
        )
    if kind == "bool_lit":
        _, f_, op, lit = node
        return (
            f"@.{f_} {op} {'true' if lit else 'false'}",
            f"CAST(json_extract_string(value, '$.{f_}') AS BOOLEAN) "
            f"{_SQL_OP.get(op, op)} {str(lit).upper()}",
        )
    if kind == "null_cmp":
        _, f_, op = node
        isnull = "IS NULL" if op == "==" else "IS NOT NULL"
        return (
            f"@.{f_} {op} null",
            f"json_extract_string(value, '$.{f_}') {isnull}",
        )
    raise AssertionError(kind)


@pytest.fixture(scope="module")
def engines(spark):
    payloads = [(r["id"], json.dumps(r)) for r in ROWS]
    sdf = spark.createDataFrame(payloads, "id int, value string").cache()
    sdf.count()
    con = duckdb.connect()
    con.execute("CREATE TABLE j (id INT, value VARCHAR)")
    con.executemany("INSERT INTO j VALUES (?, ?)", payloads)
    return sdf, con


@settings(max_examples=30, deadline=None)
@given(_ast)
def test_raw_json_predicate_matches_duckdb(engines, node):
    sdf, con = engines
    pred, sql = _render(node)
    spark_ids = {
        r["id"]
        for r in sdf.filter(compile_predicate(pred, json_col="value")).collect()
    }
    duck_ids = {
        r[0] for r in con.execute(f"SELECT id FROM j WHERE {sql}").fetchall()
    }
    assert spark_ids == duck_ids, f"pred={pred!r} sql={sql!r}"


@pytest.mark.parametrize(
    "pred,sql",
    [
        (
            "@.symbol =~ '/^C.*/'",
            "regexp_matches(json_extract_string(value, '$.symbol'), '^C.*')",
        ),
        (
            "@.symbol =~ '/[A-M]+/' && @.buys > 0",
            "regexp_matches(json_extract_string(value, '$.symbol'), '[A-M]+')"
            " AND CAST(json_extract_string(value, '$.buys') AS DOUBLE) > 0",
        ),
    ],
)
def test_raw_json_regex_matches_duckdb(engines, pred, sql):
    # both rlike (Spark) and regexp_matches (DuckDB) are SEARCHES
    # (unanchored substring match), so the same pattern text means the
    # same thing on both sides
    sdf, con = engines
    spark_ids = {
        r["id"]
        for r in sdf.filter(compile_predicate(pred, json_col="value")).collect()
    }
    duck_ids = {
        r[0] for r in con.execute(f"SELECT id FROM j WHERE {sql}").fetchall()
    }
    assert spark_ids == duck_ids, f"pred={pred!r}"

"""Run every declared ``queries()`` entry against its ``oracle_sql()``
via DuckDB — the local mirror of the driver's CORRECTNESS gate.
Runs at sf0.001 by default (fast); set SPARK_GRAFT_TEST_SF_DIR to
sf0.01 to reproduce the driver's exact scale.
"""

import pytest

import __spark_entry__ as entry_mod
from tests.oracle import compare

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_every_query_has_callable():
    assert QUERIES, "queries() must not be empty"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, sf_dir, name):
    assert name in QUERIES, f"oracle_sql has {name} but queries() doesn't"
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0

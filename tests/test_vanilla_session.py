"""Driver-harness parity: every declared query must work under a session
the package did NOT configure.

Round-1 regression: ``load_table`` relied on the builder's
``spark.sql.legacy.parquet.nanosAsLong`` conf; the driver's vanilla
SparkSession threw PARQUET_TYPE_ILLEGAL on every ``events`` read and 14
reference-surface queries errored (VERDICT.md §"What's wrong" #1).  The
whole pytest suite ran under ``get_spark()`` and was structurally unable
to catch it.

``spark.newSession()`` gives a fresh ``SQLConf`` on the shared context;
explicitly unsetting the legacy conf reproduces the driver's vanilla
environment.  Analysis (schema resolution) is where the bug class
throws, so asserting a resolved non-empty schema is the right gate —
full execution parity is covered by test_oracle_parity.py.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

_QUERIES = entrymod.queries()


@pytest.fixture(scope="module")
def vanilla(spark):
    s = spark.newSession()
    yield s


@pytest.mark.parametrize("key", sorted(_QUERIES))
def test_query_under_vanilla_session(vanilla, sf_dir, key):
    # Simulate the driver: no package-set confs in effect before the call.
    vanilla.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    df = _QUERIES[key](vanilla, sf_dir)
    assert len(df.schema.fields) > 0


def test_entry_under_vanilla_session(vanilla):
    vanilla.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    df = entrymod.entry(vanilla)
    assert len(df.schema.fields) > 0

"""Interactive-query surface tests, mirroring the reference's
integration scenarios (``InteractiveQueriesIntegrationTest.java``):
6-symbol universe {CFLT, ZELK, GOOGL, SHMDF, TWTR, MSFT}, key query,
multikey over all 6, inclusive range CFLT..ZELK returning all 6,
filtered range selecting exactly CFLT.
"""

import pytest
from pyspark.sql import functions as F

from kafkastreamsinteractivequeries_spark.operators.aggregation import aggregate_transactions
from kafkastreamsinteractivequeries_spark.plans.queries import (
    FilteredRangeQuery,
    KeyQuery,
    MultiKeyQuery,
    QueryResponse,
    RangeQuery,
    create_range_query,
)
from kafkastreamsinteractivequeries_spark.plans.service import InteractiveQueryService

SYMBOLS = ["CFLT", "ZELK", "GOOGL", "SHMDF", "TWTR", "MSFT"]


@pytest.fixture(scope="module")
def service(spark):
    # Fixture B from FIXTURES.md: CFLT gets 5 buys×1000 + 5 sells×500
    # (deterministic buys=5000 > sells=2500); others get Fixture A
    # records: 4 × amount=100, buy = (i % 2 == 0).
    rows = []
    for sym in SYMBOLS:
        if sym == "CFLT":
            rows += [(sym, True, 1000.0, 10) for _ in range(5)]
            rows += [(sym, False, 500.0, 10) for _ in range(5)]
        else:
            rows += [(sym, i % 2 == 0, 100.0, 5) for i in range(4)]
    txns = spark.createDataFrame(rows, ["symbol", "buy", "amount", "number_shares"])
    return InteractiveQueryService(aggregate_transactions(txns))


def symbols_of(df):
    return {r.symbol for r in df.collect()}


def test_aggregation_semantics(service):
    row = service.execute(KeyQuery.with_key("CFLT")).collect()[0]
    assert row.buys == 5000.0 and row.sells == 2500.0 and row.number_shares == 100


def test_key_query_exactly_one(service):
    # InteractiveQueriesIntegrationTest.java:123-125
    rows = service.execute(KeyQuery.with_key("CFLT")).collect()
    assert len(rows) == 1 and rows[0].symbol == "CFLT"


def test_key_query_missing_key(service):
    assert service.execute(KeyQuery.with_key("NOPE")).count() == 0


def test_multikey_all_six(service):
    # InteractiveQueriesIntegrationTest.java:309-312
    assert symbols_of(service.execute(MultiKeyQuery.with_keys(SYMBOLS))) == set(SYMBOLS)


def test_range_inclusive_all_six(service):
    # lower='CFLT', upper='ZELK' inclusive lexicographic → all 6
    # (InteractiveQueriesIntegrationTest.java:231-233)
    assert symbols_of(service.execute(RangeQuery.with_range("CFLT", "ZELK"))) == set(SYMBOLS)


def test_range_bounds_inclusive_endpoints(service):
    got = symbols_of(service.execute(RangeQuery.with_range("CFLT", "MSFT")))
    assert got == {"CFLT", "GOOGL", "MSFT"}


def test_range_lower_only(service):
    got = symbols_of(service.execute(RangeQuery.with_lower_bound("SHMDF")))
    assert got == {"SHMDF", "TWTR", "ZELK"}


def test_range_upper_only(service):
    got = symbols_of(service.execute(RangeQuery.with_upper_bound("GOOGL")))
    assert got == {"CFLT", "GOOGL"}


def test_full_scan(service):
    assert symbols_of(service.execute(RangeQuery.with_no_bounds())) == set(SYMBOLS)


def test_filtered_range_symbol_eq(service):
    # filter `@.symbol == 'CFLT'` → exactly CFLT
    # (InteractiveQueriesIntegrationTest.java:273-276)
    q = FilteredRangeQuery.with_bounds("CFLT", "ZELK").predicate("@.symbol == 'CFLT'")
    rows = service.execute(q).collect()
    assert len(rows) == 1 and rows[0].symbol == "CFLT"


def test_filtered_range_buys_gt_sells(service):
    q = FilteredRangeQuery.with_bounds("CFLT", "ZELK").predicate("@.buys > @.sells")
    assert symbols_of(service.execute(q)) == {"CFLT"}


def test_create_range_query_dispatch():
    # QueryUtils.createRangeQuery semantics incl. blank-as-absent
    # (QueryUtils.java:15-46)
    assert create_range_query(None, None) == RangeQuery(None, None)
    assert create_range_query(" ", "") == RangeQuery(None, None)
    assert create_range_query("A", None) == RangeQuery("A", None)
    assert create_range_query(None, "B") == RangeQuery(None, "B")
    assert create_range_query("A", "B") == RangeQuery("A", "B")
    fq = create_range_query("A", "B", "@.buys > 1")
    assert isinstance(fq, FilteredRangeQuery) and fq.predicate_src == "@.buys > 1"


def test_query_response_envelope(service):
    resp = service.execute_response(KeyQuery.with_key("CFLT"))
    assert resp.error_message is None
    assert len(resp.result) == 1 and resp.result[0]["symbol"] == "CFLT"
    assert resp.host_information == "spark-driver"
    assert "stock-aggregation-state-store" in resp.execution_info


def test_execute_response_default_collect_limit_is_bounded(service):
    """The Python API default must cap the driver collect (unbounded is
    an explicit opt-in): signature default == the REST layer's 10k cap,
    and a small explicit limit truncates."""
    import inspect

    from kafkastreamsinteractivequeries_spark.plans.queries import RangeQuery
    from kafkastreamsinteractivequeries_spark.plans.service import (
        InteractiveQueryService,
    )

    sig = inspect.signature(InteractiveQueryService.execute_response)
    assert sig.parameters["collect_limit"].default == 10_000
    capped = service.execute_response(RangeQuery(None, None), collect_limit=2)
    assert len(capped.result) == 2
    full = service.execute_response(RangeQuery(None, None), collect_limit=None)
    assert len(full.result) > 2


def test_key_query_prunes_partitions(spark, tmp_path):
    # Point lookups must prune: write the serving table partitioned by
    # symbol and check the scan only touches the matching partition —
    # the Spark-native analog of queryMetadataForKey single-partition
    # routing (StockController.java:364-375).
    path = str(tmp_path / "serving")
    rows = [(s, float(i), float(i), i) for i, s in enumerate(SYMBOLS)]
    df = spark.createDataFrame(rows, ["symbol", "buys", "sells", "number_shares"])
    df.write.partitionBy("symbol").parquet(path)
    q = KeyQuery.with_key("CFLT").apply(spark.read.parquet(path))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "CFLT" in plan
    assert q.count() == 1


@pytest.mark.slow  # >10 s; runs in the full suite
def test_example_pipeline_runs_end_to_end(spark, tmp_path):
    # keep the demo script from rotting: run it in-process at sf0.001
    import runpy
    import sys

    argv = sys.argv
    sys.argv = ["example_pipeline.py", sf_dir_default(), str(tmp_path / "out")]
    try:
        runpy.run_path("scripts/example_pipeline.py", run_name="__main__")
    finally:
        sys.argv = argv


def sf_dir_default():
    import os

    return os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

"""Physical-plan regression tests — the scale contract.

Correctness is the oracle's job; these assert the *plan shape* that
makes each operator viable at 100 TB: filters pushed to the parquet
scan, columns pruned, small dims broadcast, no accidental cartesian.
"""

import re

import pytest

import __spark_entry__ as entry_mod

QUERIES = entry_mod.queries()


def plan_of(spark, sf_dir, name):
    return QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def read_schemas(plan):
    return [m.group(1) for m in re.finditer(r"ReadSchema: ([^\n]*)", plan)]


def test_pricing_summary_pushdown_and_pruning(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "a1_pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in plan  # filter reached the scan
    schema = read_schemas(plan)[0]
    assert "l_orderkey" not in schema and "l_partkey" not in schema  # pruned


def test_revenue_by_nation_broadcasts_dims(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "a2_revenue_by_nation")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # fact scan reads only join key + measure columns
    li_schema = [s for s in read_schemas(plan) if "l_extendedprice" in s][0]
    assert "l_shipdate" not in li_schema and "l_quantity" not in li_schema


def test_semi_join_prunes_payload(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "a4_order_priority_exists")
    li_schema = [s for s in read_schemas(plan) if "l_orderkey" in s and "l_shipdate" in s][0]
    # EXISTS side must not read measures
    assert "l_extendedprice" not in li_schema


def test_key_query_predicate_pushed(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q1_key_query")
    assert re.search(r"PushedFilters: \[[^\]]*EqualTo\(event_type,purchase\)", plan)


def test_aggregates_are_partial(spark, sf_dir):
    # partial (map-side) aggregation before the shuffle — one HashAggregate
    # pair around a single Exchange keyed on the group key
    plan = plan_of(spark, sf_dir, "t5_stock_aggregation")
    assert plan.count("HashAggregate") >= 2
    assert "partial_sum" in plan  # map-side combine before the Exchange
    assert plan.count("Exchange") == 1  # exactly one shuffle, on the group key
    # no Python evaluation in the hot path (JsonPath decode is JVM-side)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_manifest_is_single_scan_no_shuffle(spark, sf_dir):
    # m1: header parsing must stay inside the scan stage (zero exchanges)
    plan = plan_of(spark, sf_dir, "m1_asset_manifest")
    assert "Exchange" not in plan
    assert "BroadcastHashJoin" not in plan and "SortMergeJoin" not in plan


def test_knn_bruteforce_no_corpus_shuffle(spark, sf_dir):
    # s1: query side broadcast; the only exchanges allowed are the
    # corpus spread() repartition and the top-k window partitioning —
    # never a corpus-sized join shuffle (no SortMergeJoin).
    plan = plan_of(spark, sf_dir, "s1_knn_bruteforce")
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # query set joined via broadcast


def test_ivf_assignment_broadcasts_centroids(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "s5_ivf_assign")
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan  # no corpus-vs-centroid shuffle join


def test_near_dup_verify_uses_shuffle_hash_not_broadcast(spark, sf_dir):
    # d9: neither the pair list nor the per-doc map table may be
    # broadcast (pair list = driver collect; doc table grows with the
    # corpus) — the verify joins must be ShuffledHashJoin.
    plan = plan_of(spark, sf_dir, "d9_weighted_near_duplicates")
    assert "ShuffledHashJoin" in plan


def test_text_stats_zero_shuffle(spark, sf_dir):
    # x1 is map-only modulo the local spread() repartition: no
    # aggregation or join exchanges.
    plan = plan_of(spark, sf_dir, "x1_text_stats")
    assert "HashAggregate" not in plan
    assert "Join" not in plan

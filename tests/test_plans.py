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


def _t5_branch_plan(spark, sf_dir, tag):
    # `variant = tag` folds to false in every other union child, so
    # PropagateEmptyRelation prunes them and the plan shows one branch.
    import __spark_entry__ as entry_mod
    from pyspark.sql import functions as F

    df = entry_mod.queries()["t5_stock_aggregation"](spark, sf_dir)
    return df.filter(F.col("variant") == tag)._jdf.queryExecution().executedPlan().toString()


def test_aggregates_are_partial(spark, sf_dir):
    # partial (map-side) aggregation before the shuffle — one HashAggregate
    # pair around a single Exchange keyed on the group key ('agg' branch,
    # the reference-shaped continuous aggregate)
    plan = _t5_branch_plan(spark, sf_dir, "agg")
    assert plan.count("HashAggregate") >= 2
    assert "partial_sum" in plan  # map-side combine before the Exchange
    assert plan.count("Exchange") == 1  # exactly one shuffle, on the group key
    # no Python evaluation in the hot path (JsonPath decode is JVM-side)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_rollup_merge_never_rereads_raw(spark, sf_dir):
    # 'rolled' = hour partials then day merge: exactly two aggregation
    # levels (two Exchanges), raw scanned once — the landed-partials
    # maintenance contract.  'daily' (direct) stays a single shuffle.
    rolled = _t5_branch_plan(spark, sf_dir, "rolled")
    assert rolled.count("Exchange") == 2
    assert rolled.count("Scan parquet") == 1 or rolled.count("FileScan") == 1
    daily = _t5_branch_plan(spark, sf_dir, "daily")
    assert daily.count("Exchange") == 1


def test_manifest_is_single_scan_no_shuffle(spark, sf_dir):
    # m1: header parsing must stay inside the scan stage (zero exchanges)
    plan = plan_of(spark, sf_dir, "m1_asset_manifest")
    assert "Exchange" not in plan
    assert "BroadcastHashJoin" not in plan and "SortMergeJoin" not in plan


def test_knn_union_no_corpus_shuffle(spark, sf_dir):
    # s1 (tagged union of all five kNN paths): query side broadcast;
    # the only exchanges allowed are the corpus spread() repartition
    # and the top-k window partitioning — never a corpus-sized join
    # shuffle (no SortMergeJoin in ANY branch).  Audited on the
    # module-level knn_union (the driver key checkpoints this union
    # before adding the recall branches, which truncates the lineage
    # the audit needs)...
    plan = (
        entry_mod.knn_union(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # query set joined via broadcast
    # ...and the full driver key (checkpoint + bounded recall joins)
    # must not add a shuffle join of its own either.
    full = plan_of(spark, sf_dir, "s1_knn")
    assert "SortMergeJoin" not in full


def test_ivf_assignment_broadcasts_centroids(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "s2_index_assignments")
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan  # no corpus-vs-centroid shuffle join


def test_near_dup_verify_uses_shuffle_hash_not_broadcast(spark, sf_dir):
    # d9: neither the pair list nor the per-doc map table may be
    # broadcast (pair list = driver collect; doc table grows with the
    # corpus) — the verify joins must be ShuffledHashJoin.
    plan = plan_of(spark, sf_dir, "d9_weighted_near_duplicates")
    assert "ShuffledHashJoin" in plan


def test_near_dup_verify_is_staged(spark, sf_dir):
    # d9's verify must prune on one-long-per-doc totals BEFORE the tf
    # maps are shipped: the exact min/max ratio bound appears as a
    # filter over total_a/total_b upstream of the map_zip_with
    # intersection, so the heavy map columns only join to survivors.
    # Round 8 moved the totals ONTO the bucket rows (they ride the
    # collect_list payload structs), so the prune fires as pairs are
    # emitted and the verify's two per-pair totals joins are GONE:
    # exactly 3 ShuffledHashJoins remain (bucket⋈totals + 2 map joins).
    plan = plan_of(spark, sf_dir, "d9_weighted_near_duplicates")
    # Catalyst pushes the bound through the struct projection into the
    # pair-expansion explode itself (least/greatest over the .total
    # struct fields) — even before the distinct
    assert re.search(r"least\([^\n]*total[^\n]*greatest\([^\n]*total", plan)
    assert plan.count("ShuffledHashJoin") == 3


def test_minhash_pairs_use_group_expansion_not_self_join(spark, sf_dir):
    # d9's candidate stage (sparse-bucket regime) must be the
    # group+bounded-expansion shape: a collect_list aggregate over the
    # band buckets and NO bucket-keyed self-join (whose second
    # bucket-table shuffle and probe overhead lose in this regime).
    plan = plan_of(spark, sf_dir, "d9_weighted_near_duplicates")
    assert "collect_list" in plan
    assert "SortMergeJoin" not in plan


def test_text_stats_zero_shuffle(spark, sf_dir):
    # x1 is map-only modulo the local spread() repartition: no
    # aggregation or join exchanges.
    plan = plan_of(spark, sf_dir, "x1_text_stats")
    assert "HashAggregate" not in plan
    assert "Join" not in plan


def test_disjunctive_filter_pushed_to_both_scans(spark, sf_dir):
    # a12 (Q19 shape): Catalyst must extract per-side residuals from the
    # OR-of-ANDs and push them into BOTH parquet scans — the difference
    # between scanning 2 columns' worth of matching row groups and
    # scanning two full fact tables at 100 TB.
    plan = plan_of(spark, sf_dir, "a11_revenue_kpis")
    assert re.search(r"PushedFilters: \[[^\]]*l_quantity", plan)
    assert re.search(r"PushedFilters: \[[^\]]*p_brand", plan)


def test_late_lines_join_condition_filters_during_probe(spark, sf_dir):
    # a10: the late-shipment predicate must live in the join, not a
    # post-join Filter node.
    plan = plan_of(spark, sf_dir, "a10_late_lines_by_priority")
    assert "l_shipdate" in plan
    assert "HashAggregate" in plan  # partial agg present


def test_promo_revenue_shipdate_pushdown(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "a11_revenue_kpis")
    assert re.search(r"PushedFilters: \[[^\]]*l_shipdate", plan)


def test_kmv_uses_salted_two_phase_ranking(spark, sf_dir):
    # x10: the k-smallest selection must ride the skew-safe two-phase
    # top-k (two window passes), never a single global-window sort of
    # each group's whole distinct set.
    plan = plan_of(spark, sf_dir, "x10_cardinality_sketches")
    assert plan.count("RunningWindowFunction") >= 2 or plan.count("Window") >= 2
    # the cms branch must broadcast its bounded counter table (≤ d×w
    # rows by construction), never shuffle-join the probe stream
    assert "BroadcastHashJoin" in plan


def test_vocab_coverage_uses_take_ordered_not_full_sort(spark, sf_dir):
    # x11's global top-k must plan as TakeOrderedAndProject (per-partition
    # k-row heaps merged once) — a full Sort of the vocab table would
    # serialize millions of rows through one ordering at corpus scale.
    plan = plan_of(spark, sf_dir, "x11_vocab_bpe")
    assert "TakeOrderedAndProject" in plan
    assert "partial_count" in plan  # map-side combine on the token agg


def test_pq_adc_stays_columnar_with_broadcast_codebook(spark, sf_dir):
    # s1's pq branch: the codebook and per-query distance tables are
    # broadcast (m×k and q×m×k rows); the corpus-sized code table must
    # never be sort-merge-joined against them, and the only Python in
    # the plan is zero — PQ train/encode/ADC are pure Column
    # expressions.  Asserted on the full pre-checkpoint kNN union so
    # the invariants hold for every kNN branch at once.
    plan = (
        entry_mod.knn_union(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_codec_stages_are_arrow_batched_map_only(spark, sf_dir):
    # m7/m9: encode and decode are chained mapInPandas stages —
    # Arrow-batched (never row-at-a-time Python), with no shuffle
    # between encode and decode (they pipeline in one stage).  The
    # codec branches themselves are join-free; the 'gate' branch
    # (round 10) legitimately adds skinny id equi-joins (pixel stats ⋈
    # caption stats, assets ⋈ captions) — those must stay HASH joins
    # (broadcast or shuffled), never sort-merge or nested-loop.
    plan = plan_of(spark, sf_dir, "m7_decoded_pixel_stats")
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan  # row-at-a-time Python forbidden
    assert "SortMergeJoin" not in plan
    assert "NestedLoop" not in plan
    # The exchange budget is pinned on the CODEC + gate sub-plan: the
    # 'capdup' branch (round 11) is the LSH near-dup tier and shuffles
    # by design (band buckets, verify joins), so the variant filter
    # prunes it before counting.  spread() fan-out exchanges per union
    # branch plus the gate branch's join-side exchanges; encode→decode
    # must not add any beyond those.
    import re as _re

    from pyspark.sql import functions as F

    codec_plan = (
        QUERIES["m7_decoded_pixel_stats"](spark, sf_dir)
        .filter(
            F.col("variant").isin(
                "png", "apng", "resize", "dhash", "phash", "gate"
            )
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert len(_re.findall(r"Exchange", codec_plan)) <= 8


def test_pq_rerank_joins_candidates_shuffle_hash(spark, sf_dir):
    # the rerank refine path joins ADC survivors back to raw vectors:
    # corpus side must be SHUFFLE_HASH (grows with corpus, never
    # broadcast), query side broadcast.
    from pyspark.sql import functions as F

    from kafkastreamsinteractivequeries_spark.operators import similarity as S
    from kafkastreamsinteractivequeries_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    book = S.pq_train(emb, m=8, k=16, iterations=1)
    df = S.knn_pq_adc(emb, qs, book, k=5, rerank=20)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pii_redaction_is_map_only_zero_shuffle(spark, sf_dir):
    # x12: detection counts + redaction are pure Column regexps — the
    # only exchange is the spread() fan-out; no joins, no aggregation,
    # no Python anywhere.
    plan = plan_of(spark, sf_dir, "x12_pii_redaction")
    assert "Join" not in plan
    assert "HashAggregate" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange") <= 2  # spread() round-robin only


def test_decontamination_broadcasts_eval_grams(spark, sf_dir):
    # x13: the eval n-gram set must be the BROADCAST side of the
    # contamination join (benchmarks are MBs, corpora are TBs) — the
    # corpus's exploded gram stream is never shuffled for the join and
    # never sort-merge-joined.
    plan = plan_of(spark, sf_dir, "x13_decontamination")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # per-doc collision count partial-aggregates map-side
    assert "partial_count" in plan or "HashAggregate" in plan


def test_bm25_posting_filter_precedes_aggregation(spark, sf_dir):
    # the query-term filter must run under the tf aggregate (postings
    # discipline) — filtering after aggregation would shuffle the whole
    # corpus token stream
    from kafkastreamsinteractivequeries_spark.operators.text import bm25_search
    from kafkastreamsinteractivequeries_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    plan = bm25_search(docs, ["spark", "vector"], k=5)._jdf.queryExecution(
    ).executedPlan().toString()
    filt = plan.find("Filter array_contains")
    first_partial_tf = plan.find("partial_count")
    assert filt != -1 and first_partial_tf != -1
    # deeper in the tree = later in the printed plan string
    assert filt > first_partial_tf
    assert "TakeOrderedAndProject" in plan


def test_bipartite_decontamination_broadcasts_eval_sides(spark, sf_dir):
    from pyspark.sql import functions as F

    from kafkastreamsinteractivequeries_spark.operators.dedup import (
        cross_corpus_near_duplicates,
    )
    from kafkastreamsinteractivequeries_spark.operators.similarity import (
        embedding_decontaminate,
    )
    from kafkastreamsinteractivequeries_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    ev_docs = docs.filter(F.col("doc_id") % 20 == 0).select(
        F.col("doc_id").alias("eval_id"), "text"
    )
    plan = cross_corpus_near_duplicates(docs, ev_docs)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "SortMergeJoin" not in plan

    emb = load_table(spark, sf_dir, "embeddings")
    ev_emb = emb.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("eval_id"), "embedding"
    )
    eplan = embedding_decontaminate(emb, ev_emb)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "SortMergeJoin" not in eplan
    assert "BroadcastHashJoin" in eplan


def test_layout_keys_are_map_only(spark, sf_dir):
    # e3 zorder/hilbert: quantize + interleave + the 16 Hilbert levels
    # are pure Column arithmetic over the part scan — chained
    # projections Catalyst collapses into one codegen stage.  Any
    # Exchange/join here would mean the layout KEY computation itself
    # shuffles, which at write time would double the one layout shuffle
    # the operator budgets.  (Audited per branch: the 'compact' sibling
    # legitimately owns one manifest window shuffle, pinned below.)
    from pyspark.sql import functions as F

    df = QUERIES["e3_layout_keys"](spark, sf_dir)
    for tag in ("zorder", "hilbert"):
        plan = (
            df.filter(F.col("variant") == tag)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan, tag
        assert "Join" not in plan, tag
    compact = (
        df.filter(F.col("variant") == "compact")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert compact.count("Exchange") == 1


def test_event_analytics_never_nested_loops(spark, sf_dir):
    # e1: the funnel is a pivot aggregate (no k-way self-join chain) and
    # the interval join is bucketized — a plain ts-range join would plan
    # BroadcastNestedLoopJoin/CartesianProduct, O(|points|x|intervals|)
    # at scale.
    plan = plan_of(spark, sf_dir, "e1_event_analytics")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # the funnel pivot compiles to one per-user aggregate (partial
    # map-side), not a join chain
    assert "partial_min" in plan or "partial_first" in plan


def test_scd2_asof_joins_are_equi_partitioned(spark, sf_dir):
    # e2: the merge is one co-partitioned full-outer join per batch and
    # the as-of lookup an equi-join with the validity range as residual
    # — never a nested loop over the dimension (the 2-row fact-ts
    # broadcast crossJoin is the only nested-loop-shaped node and is
    # bounded by construction).
    plan = plan_of(spark, sf_dir, "e2_scd2_asof")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 2  # the 2-row ts table only


def test_chunking_branch_is_map_only(spark, sf_dir):
    # p2's chunk branch: token split -> stride sequence -> slice/join ->
    # one explode; the only exchanges in the union come from the pack
    # branch's documented prefix-sum machinery.
    from kafkastreamsinteractivequeries_spark.operators.text import chunk_documents
    from kafkastreamsinteractivequeries_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    plan = chunk_documents(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "HashAggregate" not in plan  # no aggregation — pure row map


def test_quality_gates_constraint_branch_is_single_pass(spark, sf_dir):
    # x6 'constraint': the whole scalar-rule suite compiles into ONE
    # aggregate over orders (conditional counts), never one scan per
    # rule; each unique rule adds exactly one keyed aggregate.  5
    # scalar rules + 2 unique rules must read orders 3 times, not 7.
    from kafkastreamsinteractivequeries_spark.operators.quality import (
        check_constraints,
    )
    from kafkastreamsinteractivequeries_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    rules = [
        ("not_null", "o_orderkey"),
        ("range", "o_totalprice", 0.0, 300000.0),
        ("in_set", "o_orderstatus", ["O", "F"]),
        ("matches", "o_orderpriority", "[1-5]-[A-Z]+"),
        ("expr", "key_not_7mult", "o_orderkey % 7 != 0"),
        ("unique", ["o_orderkey"]),
        ("unique", ["o_custkey"]),
    ]
    plan = (
        check_constraints(orders, rules)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") == 3  # 1 scalar pass + 2 unique aggs


def test_quality_gates_skew_branch_uses_heap_topk(spark, sf_dir):
    # x6 'skew': the top-20 must plan TakeOrderedAndProject (bounded
    # per-partition heaps), never a full global Sort of the key-count
    # table — the report must not itself become a skew/scale problem.
    from kafkastreamsinteractivequeries_spark.operators.analytics import skew_report
    from kafkastreamsinteractivequeries_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    plan = (
        skew_report(li, ["l_suppkey"], top_k=20)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_salted_join_spreads_hot_keys_without_nested_loop(spark, sf_dir):
    # x6 'salted': the salted join is still an equi join on
    # (key, salt) — salting must not degrade it to a nested loop, and
    # the replicated side carries the salt explode.
    from kafkastreamsinteractivequeries_spark.operators.analytics import salted_join
    from kafkastreamsinteractivequeries_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice"
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    plan = (
        salted_join(li, sup, ["l_suppkey"], salt=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Generate explode" in plan  # the salt replication


def test_semdedup_assignment_broadcasts_only_the_quantizer(spark, sf_dir):
    """SemDeDup's scale contract: the corpus is never the build side of
    a broadcast — the only broadcast inputs are the O(n_lists) centroid
    table (assignment's nested-loop over 16 rows) and over-cap cluster
    ids; pair verification joins shuffle-hash; no sort-merge join
    anywhere (nothing needs a sort at this shape)."""
    from kafkastreamsinteractivequeries_spark.operators.similarity import semdedup
    from kafkastreamsinteractivequeries_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    plan = semdedup(emb, threshold=0.3)._jdf.queryExecution(
    ).executedPlan().toString()
    # no all-pairs corner: never a cartesian; the lone nested-loop is
    # the bounded centroid broadcast (connected_components_star's
    # internal label joins are sort-merge by Spark's choice and carry
    # two-long rows — its scale contract is pinned by the d10 tests)
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    # pair verification ships embeddings via shuffle-hash, not broadcast
    assert "ShuffledHashJoin" in plan


def test_q21_decorrelation_never_rescans_per_row(spark, sf_dir):
    """waiting_suppliers de-correlates TPC-H Q21's EXISTS/NOT-EXISTS:
    the fanout is one per-order aggregate joined back once, so the plan
    must contain NO nested-loop/cartesian (the textbook correlated form
    would re-scan lineitem per row) and exactly the budgeted joins —
    orders equi-join + fanout join-back."""
    from kafkastreamsinteractivequeries_spark.operators.analytics import (
        waiting_suppliers,
    )
    from kafkastreamsinteractivequeries_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    ords = load_table(spark, sf_dir, "orders")
    plan = (
        waiting_suppliers(li, ords)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the checkpoint barrier materializes ONLY the 3-column line stream
    # (key, supplier, late flag) — everything wider was pruned upstream
    assert re.search(r"Scan ExistingRDD\[l_orderkey#\d+L,l_suppkey#\d+L,_late#\d+\]", plan)
    # fanout joins back by equi-join (shuffle-hash by hint), never loop
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan


def test_q22_scalar_subquery_broadcasts_and_anti_joins(spark, sf_dir):
    """idle_customers: the global average is a 1-row broadcast (never a
    correlated per-row subquery), the no-orders test a single left-anti
    join with the o_totalprice filter pushed to the orders scan."""
    from kafkastreamsinteractivequeries_spark.operators.analytics import (
        idle_customers,
    )
    from kafkastreamsinteractivequeries_spark.sources.tables import load_table

    cust = load_table(spark, sf_dir, "customer")
    ords = load_table(spark, sf_dir, "orders")
    plan = (
        idle_customers(cust, ords, min_order_total=400000.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    # the 1-row average is the only nested-loop-shaped node
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "LeftAnti" in plan
    assert "GreaterThanOrEqual(o_totalprice,400000.0)" in plan
    # anti-join keyset pruned to the key column
    o_schema = [s for s in read_schemas(plan) if "o_custkey" in s][0]
    assert "o_orderdate" not in o_schema


def test_q17_decorrelated_avg_joins_back_by_broadcast(spark, sf_dir):
    """small_quantity_revenue: the per-part quantity cap must come from
    ONE aggregate over the brand slice joined back by broadcast — never
    a per-row re-scan of lineitem (the textbook correlated form) — and
    the fact scan reads only the three needed columns."""
    from kafkastreamsinteractivequeries_spark.operators.analytics import (
        small_quantity_revenue,
    )
    from kafkastreamsinteractivequeries_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    plan = (
        small_quantity_revenue(li, pt)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2  # part keys + avg join-back
    # brand filter pushed to the part scan
    assert "EqualTo(p_brand,Brand#4)" in plan
    li_schema = [s for s in read_schemas(plan) if "l_quantity" in s][0]
    assert "l_shipdate" not in li_schema and "l_discount" not in li_schema


def test_q15_global_max_broadcasts_one_row(spark, sf_dir):
    """top_revenue_supplier: the revenue view's global max must reach
    the filter as a 1-row broadcast (the only nested-loop-shaped node);
    supplier names attach by broadcast hash join; shipdate pushed to
    the fact scan."""
    from kafkastreamsinteractivequeries_spark.operators.analytics import (
        top_revenue_supplier,
    )
    from kafkastreamsinteractivequeries_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    plan = (
        top_revenue_supplier(li, sup)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1  # the 1-row max only
    assert "BroadcastHashJoin" in plan  # supplier dim
    assert re.search(r"PushedFilters: \[[^\]]*l_shipdate", plan)


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q2_min_cost_is_window_over_one_aggregate(spark, sf_dir):
    """min_cost_supplier de-correlates TPC-H Q2's correlated-MIN: the
    per-part minimum is a window over the (pk, sk) aggregate — never a
    per-row re-aggregation — and the part slice broadcasts into the
    supply aggregation (type/size filters pushed to the part scan)."""
    from kafkastreamsinteractivequeries_spark.operators.analytics import (
        min_cost_supplier,
    )
    from kafkastreamsinteractivequeries_spark.sources.tables import load_table

    plan = _executed(
        min_cost_supplier(
            load_table(spark, sf_dir, "lineitem"),
            load_table(spark, sf_dir, "part"),
            load_table(spark, sf_dir, "supplier"),
        )
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan and "min(unit_cost" in plan
    assert "EqualTo(p_type,SMALL)" in plan and "LessThan(p_size,10)" in plan
    assert plan.count("BroadcastHashJoin") >= 2  # part keys in, supplier names out


def test_q20_dominant_suppliers_zero_extra_scans(spark, sf_dir):
    """dominant_suppliers de-correlates TPC-H Q20's nested-IN +
    correlated scalar: ONE aggregate over the sliced fact, the per-part
    total a window sum over those same rows (no join, no second fact
    scan), the supplier attach a semi-join."""
    from kafkastreamsinteractivequeries_spark.operators.analytics import (
        dominant_suppliers,
    )
    from kafkastreamsinteractivequeries_spark.sources.tables import load_table

    plan = _executed(
        dominant_suppliers(
            load_table(spark, sf_dir, "lineitem"),
            load_table(spark, sf_dir, "part"),
            load_table(spark, sf_dir, "supplier"),
        )
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan
    assert "LeftSemi" in plan
    # exactly one lineitem scan: slice once, aggregate once, window it
    assert plan.count("lineitem") == 1
    assert re.search(r"PushedFilters: \[[^\]]*l_shipdate", plan)


def test_q18_having_filter_in_aggregate_stage(spark, sf_dir):
    """large_quantity_orders: one shuffle aggregates lineitem by order
    key with the threshold filter in the same stage; the join back to
    orders is an equi-join (never a loop) and the fact scan reads only
    the two needed columns."""
    from kafkastreamsinteractivequeries_spark.operators.analytics import (
        large_quantity_orders,
    )
    from kafkastreamsinteractivequeries_spark.sources.tables import load_table

    plan = _executed(
        large_quantity_orders(
            load_table(spark, sf_dir, "lineitem"),
            load_table(spark, sf_dir, "orders"),
        )
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    li_schema = [s for s in read_schemas(plan) if "l_quantity" in s][0]
    assert "l_partkey" not in li_schema and "l_extendedprice" not in li_schema


def test_q9_supply_cost_shuffles_only_the_part_slice(spark, sf_dir):
    """product_profit: the name-LIKE part keys broadcast into BOTH the
    supply aggregation and the fact slice, so every shuffle runs on the
    slice; the LIKE filter pushes to the part scan."""
    from kafkastreamsinteractivequeries_spark.operators.analytics import (
        product_profit,
    )
    from kafkastreamsinteractivequeries_spark.sources.tables import load_table

    plan = _executed(
        product_profit(
            load_table(spark, sf_dir, "lineitem"),
            load_table(spark, sf_dir, "part"),
            load_table(spark, sf_dir, "supplier"),
            load_table(spark, sf_dir, "nation"),
        )
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "StringContains(p_name,red)" in plan
    # part-key broadcast gates each lineitem branch before any exchange
    assert plan.count("BroadcastHashJoin") >= 3


def test_q7_q8_fact_joins_are_equi_after_broadcast_dims(spark, sf_dir):
    """nation_pair_volume / market_share: supplier→nation (and the
    part/region slices) fold in as broadcasts; the only shuffles are
    the fact-fact equi-joins on the FILTERED line slice."""
    from kafkastreamsinteractivequeries_spark.operators.analytics import (
        market_share,
        nation_pair_volume,
    )
    from kafkastreamsinteractivequeries_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    ords = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    for df in (
        nation_pair_volume(li, ords, cust, sup, nat),
        market_share(li, ords, cust, sup, nat, reg, load_table(spark, sf_dir, "part")),
    ):
        plan = _executed(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert plan.count("BroadcastHashJoin") >= 2
        assert re.search(r"PushedFilters: \[[^\]]*l_shipdate", plan) or re.search(
            r"PushedFilters: \[[^\]]*o_orderdate", plan
        )


def test_q11_reaggregates_own_output_not_the_fact(spark, sf_dir):
    """important_parts: the global total re-aggregates the checkpointed
    per-part rows — the plan downstream of the barrier contains NO
    parquet scan, and the 1-row total is the only loop-shaped node."""
    from kafkastreamsinteractivequeries_spark.operators.analytics import (
        important_parts,
    )
    from kafkastreamsinteractivequeries_spark.sources.tables import load_table

    plan = _executed(important_parts(load_table(spark, sf_dir, "lineitem")))
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    # both consumers read the materialized barrier, not lineitem
    assert plan.count("Scan ExistingRDD") == 2
    assert "lineitem" not in plan


def test_q16_blocklist_is_broadcast_anti_join(spark, sf_dir):
    """supplier_part_counts: the NOT-IN blocklist must execute as a
    broadcast LEFT-ANTI (never a shuffled NOT-IN with null semantics),
    with the size/type filters pushed to the part scan."""
    from kafkastreamsinteractivequeries_spark.operators.analytics import (
        supplier_part_counts,
    )
    from kafkastreamsinteractivequeries_spark.sources.tables import load_table

    plan = _executed(
        supplier_part_counts(
            load_table(spark, sf_dir, "lineitem"),
            load_table(spark, sf_dir, "part"),
            load_table(spark, sf_dir, "supplier"),
        )
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftAnti" in plan
    assert "LessThan(s_acctbal,0.0)" in plan
    assert re.search(r"In\(p_size, \[1,11,17,23,29,5\]\)", plan)


def test_q13_priority_filter_lands_before_outer_join(spark, sf_dir):
    """customer_order_distribution: the ON-clause priority filter is
    applied to orders BEFORE the left join (preserved-side semantics
    make that equivalent), so the join input is already filtered."""
    from kafkastreamsinteractivequeries_spark.operators.analytics import (
        customer_order_distribution,
    )
    from kafkastreamsinteractivequeries_spark.sources.tables import load_table

    plan = _executed(
        customer_order_distribution(
            load_table(spark, sf_dir, "customer"),
            load_table(spark, sf_dir, "orders"),
        )
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftOuter" in plan
    # only the two needed order columns leave the scan
    o_schema = [s for s in read_schemas(plan) if "o_custkey" in s][0]
    assert "o_totalprice" not in o_schema


def test_q6_all_predicates_reach_the_scan(spark, sf_dir):
    """forecast_revenue: all three predicates (shipdate range, discount
    band, quantity cap) must appear in the parquet PushedFilters —
    row-group pruning is the whole point of the Q6 shape — and the scan
    reads only the four needed columns."""
    from kafkastreamsinteractivequeries_spark.operators.analytics import (
        forecast_revenue,
    )
    from kafkastreamsinteractivequeries_spark.sources.tables import load_table

    plan = _executed(forecast_revenue(load_table(spark, sf_dir, "lineitem")))
    # the PushedFilters list elides past ~100 chars — assert presence
    # on the (full) Filter node and pushdown on the scan's prefix
    assert re.search(r"PushedFilters: \[[^\]]*l_shipdate", plan)
    flt = re.search(r"\+- Filter ([^\n]*)", plan).group(1)
    for pred in ("l_discount#\\d+ >= 0.04", "l_discount#\\d+ <= 0.08", "l_quantity#\\d+ < 24.0"):
        assert re.search(pred, flt), f"missing {pred}"
    schema = [s for s in read_schemas(plan) if "l_extendedprice" in s][0]
    assert "l_orderkey" not in schema and "l_returnflag" not in schema


def test_line_dedup_is_aggregation_not_window(spark, sf_dir):
    # first-occurrence selection must be the map-side-combinable
    # min-struct aggregate — a row_number window would funnel every
    # occurrence of a hot boilerplate line into one task
    import __spark_entry__ as entry_mod
    from pyspark.sql import functions as F

    df = entry_mod.queries()["x4_winnowing_fingerprint"](spark, sf_dir)
    plan = (
        df.filter(F.col("variant") == "linededup")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    assert "partial_min" in plan


def test_no_straddle_packing_is_one_shard_shuffle(spark, sf_dir):
    # p2's nostraddle branch: the sequential next-fit fill runs INSIDE
    # an Arrow group batch — exactly one exchange (the shard
    # partitioning), no join, no window, and the only Python is the
    # grouped-map fill itself.
    from kafkastreamsinteractivequeries_spark.operators.curation import (
        pack_sequences_no_straddle,
    )
    from kafkastreamsinteractivequeries_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    plan = (
        pack_sequences_no_straddle(docs, seq_len=256, shards=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
    assert "FlatMapGroupsInPandas" in plan
    assert "Join" not in plan and "Window" not in plan
    assert "BatchEvalPython" not in plan  # never row-at-a-time Python


def test_pagerank_no_cartesian_and_skinny_rank_joins(spark, sf_dir):
    """PageRank's scale contract: every join is an equi (hash) join or
    a deliberate 1-row scalar broadcast — never a CartesianProduct over
    data tables.  The per-iteration localCheckpoint truncates lineage,
    so the final plan shows only the closing stage; the iteration-body
    contract is asserted on an UNCHECKPOINTED replica of one step."""
    from pyspark.sql import functions as F

    from kafkastreamsinteractivequeries_spark.operators import graph as G
    from kafkastreamsinteractivequeries_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    edges = G.normalize_edges(
        ev.select(
            F.col("user_id").alias("src"),
            ((F.col("event_id") * 7 + 3) % 41).alias("dst"),
        )
    )
    final = (
        G.pagerank(edges, iterations=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in final

    # one iteration body, unchekpointed: rank join on src must be an
    # equi hash join; the dangling scalar attaches as a 1-row broadcast
    deg = G.out_degrees(edges)
    ranks = edges.select(F.col("src").alias("id")).distinct().join(
        deg, "id", "left"
    ).select(
        "id",
        F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
        F.lit(10**9).alias("rank"),
    )
    dangling = ranks.filter(F.col("out_deg") == 0).agg(
        F.coalesce(F.sum("rank"), F.lit(0)).alias("dangling")
    )
    step = (
        edges.join(
            ranks.filter(F.col("out_deg") > 0).select(
                F.col("id").alias("src"),
                F.expr("rank div out_deg").alias("share"),
            ),
            "src",
        )
        .groupBy(F.col("dst").alias("id"))
        .agg(F.sum("share").alias("inflow"))
        .crossJoin(F.broadcast(dangling))
    )
    body = step._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in body
    assert "BroadcastNestedLoopJoin" in body  # the 1-row scalar attach
    assert "Join" in body and "partial" in body.lower()  # map-side agg


def test_preference_decontamination_broadcasts_eval_prompts(spark, sf_dir):
    # RLHF prompt decontamination follows the x13 contract: the eval
    # prompt set is the BROADCAST side of the anti-join; the pairs
    # corpus is never shuffled or sort-merge-joined for it.
    from pyspark.sql import functions as F

    from kafkastreamsinteractivequeries_spark.operators.preference import (
        decontaminate_preference_prompts,
    )
    from kafkastreamsinteractivequeries_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    pairs = docs.select(
        F.col("doc_id").alias("pair_id"),
        F.col("text").alias("prompt"),
        F.col("text").alias("chosen"),
        F.lit("no").alias("rejected"),
    )
    evals = docs.limit(20).select("text").withColumnRenamed("text", "prompt")
    plan = (
        decontaminate_preference_prompts(pairs, evals)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_chat_chain_single_shuffle_and_objectives_shuffle_free(spark, sf_dir):
    # chat parse -> mask: the only exchange is the per-conv window's
    # partition-by (one hash exchange on conv_id); the FIM and span
    # transforms are pure map work — ZERO exchanges over the corpus.
    from pyspark.sql import functions as F

    from kafkastreamsinteractivequeries_spark.operators.chat import (
        chat_loss_mask,
        parse_conversations,
    )
    from kafkastreamsinteractivequeries_spark.operators.objectives import (
        fim_transform,
        span_corruption,
    )
    from kafkastreamsinteractivequeries_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    convs = docs.select(
        (F.col("doc_id") % 101).alias("conv_id"),
        F.to_json(
            F.array(
                F.struct(
                    F.lit("user").alias("role"), F.col("text").alias("content")
                )
            )
        ).alias("messages"),
    )
    plan = (
        chat_loss_mask(parse_conversations(convs))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1  # the conv_id window partition
    for op in (fim_transform(docs), span_corruption(docs)):
        p = op._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in p, "objective transforms must be map-only"


def test_quality_signal_export_is_one_scan_no_shuffle(spark, sf_dir):
    # the Dolma-style signals export must assemble EVERY signal family
    # in the scan stage: one file scan, zero exchanges, no Python —
    # the no-per-signal-rescans contract
    from kafkastreamsinteractivequeries_spark.operators.text import (
        quality_signal_export,
    )
    from kafkastreamsinteractivequeries_spark.sources.tables import load_table

    df = quality_signal_export(
        load_table(spark, sf_dir, "documents"), ["dup", "legacy"]
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert max(plan.count("Scan parquet"), plan.count("FileScan")) == 1
    # spread()'s round-robin repartition (single-file local parallelism)
    # is allowed; any HASH/RANGE exchange would mean a signal shuffled
    exchanges = re.findall(r"Exchange (\w+)", plan)
    assert all(e == "RoundRobinPartitioning" for e in exchanges), exchanges
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_jaccard_verify_intersect_evaluated_once_outside_join(spark, sf_dir):
    # the d6-family verify barrier (r11): size(shuffle(array_intersect))
    # keeps the threshold filter OUT of the join condition — inlined, the
    # optimizer re-evaluated array_intersect 3× per candidate pair (twice
    # in the pushed join condition, once in the project).  Pin the shape
    # so a Spark upgrade or refactor can't silently re-inline it.
    from kafkastreamsinteractivequeries_spark.operators.dedup import (
        minhash_near_duplicates,
    )
    from kafkastreamsinteractivequeries_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    plan = (
        minhash_near_duplicates(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("array_intersect(") == 1, plan.count("array_intersect(")
    # joins print on one line with their condition inline in toString()
    for line in plan.splitlines():
        if "Join" in line:
            assert "array_intersect" not in line, line[:300]


def test_cosine_fold_stays_out_of_join_conditions(spark, sf_dir):
    # the s4/s1-family eval_once barrier (r11): the 64-element
    # aggregate(zip_with(...)) cosine fold must never appear inside a
    # join condition — inlined, every candidate pair paid the fold up to
    # 4× (join condition evaluation + project).  element_at(shuffle(
    # array(c)),1) is the bit-exact identity that pins it to the project.
    from kafkastreamsinteractivequeries_spark.operators.similarity import (
        embedding_near_duplicates,
    )
    from kafkastreamsinteractivequeries_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    plan = (
        embedding_near_duplicates(emb, threshold=0.4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "zip_with" in plan  # the fold exists (in a Project)
    # joins print on one line with their condition inline in toString()
    for line in plan.splitlines():
        if "Join" in line:
            assert "zip_with" not in line, line[:300]

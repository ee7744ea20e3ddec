"""Unit tests for operators/sketches.py (KMV / HLL / count-min)."""

import pytest
from pyspark.sql import functions as F

from kafkastreamsinteractivequeries_spark.operators.sketches import (
    cms_counters,
    cms_estimate,
    hll_distinct,
    kmv_distinct,
    kmv_hash,
)


def test_kmv_exact_below_k(spark):
    # Fewer distinct keys than k → the sketch holds every hash → exact.
    df = spark.range(10).select(
        F.lit("g").alias("g"), (F.col("id") % 5).alias("key")
    )
    row = kmv_distinct(df, "key", ["g"], k=32).collect()[0]
    assert row.n_kept == 5
    assert row.distinct_estimate == 5.0


def test_kmv_estimate_accuracy(spark):
    # 2000 distinct keys, k=64: KMV relative standard error ~ 1/sqrt(k-1)
    # ≈ 12.6%; assert within 4 sigma.
    df = spark.range(2000).select(F.lit("g").alias("g"), F.col("id").alias("key"))
    row = kmv_distinct(df, "key", ["g"], k=64).collect()[0]
    assert row.n_kept == 64
    assert abs(row.distinct_estimate - 2000) / 2000 < 0.5


def test_kmv_hash_bijective_on_small_domain(spark):
    # Odd multipliers mod 2^32 are bijections → no collisions below the
    # ring size, so the sketch is collision-free where it matters.
    n = spark.range(100_000).select(kmv_hash(F.col("id")).alias("h")).agg(
        F.countDistinct("h")
    ).collect()[0][0]
    assert n == 100_000


def test_hll_estimate_accuracy(spark):
    # 2000 distinct keys, m=64 registers: HLL relative standard error
    # ~ 1.04/sqrt(m) ≈ 13%; assert within ~4 sigma.
    df = spark.range(2000).select(F.lit("g").alias("g"), F.col("id").alias("key"))
    row = hll_distinct(df, "key", ["g"], p=6).collect()[0]
    assert abs(row.distinct_estimate - 2000) / 2000 < 0.5


def test_hll_small_range_linear_counting(spark):
    # Tiny cardinality vs m=64 registers → the linear-counting branch:
    # estimate stays close to exact (within a couple of counts).
    df = spark.range(8).select(F.lit("g").alias("g"), F.col("id").alias("key"))
    row = hll_distinct(df, "key", ["g"], p=6).collect()[0]
    assert abs(row.distinct_estimate - 8) <= 2


def test_hll_insensitive_to_duplication(spark):
    # max-merge of registers is idempotent — duplicates can't move them.
    base = spark.range(500).select(F.lit("g").alias("g"), F.col("id").alias("key"))
    dup = base.union(base).union(base)
    a = hll_distinct(base, "key", ["g"], p=6).collect()[0]
    b = hll_distinct(dup, "key", ["g"], p=6).collect()[0]
    assert a.distinct_estimate == b.distinct_estimate
    assert a.nonzero_buckets == b.nonzero_buckets


def test_hll_register_merge_equals_union(spark):
    # Mergeability: HLL over A ∪ B must equal HLL over the concatenated
    # input — the property that makes the sketch shuffle-combinable.
    a = spark.range(0, 800).select(F.lit("g").alias("g"), F.col("id").alias("key"))
    b = spark.range(400, 1200).select(F.lit("g").alias("g"), F.col("id").alias("key"))
    merged = hll_distinct(a.union(b), "key", ["g"], p=6).collect()[0]
    direct = hll_distinct(
        spark.range(0, 1200).select(F.lit("g").alias("g"), F.col("id").alias("key")),
        "key",
        ["g"],
        p=6,
    ).collect()[0]
    assert merged.distinct_estimate == direct.distinct_estimate


def test_cms_never_underestimates_and_is_tight_here(spark):
    # Zipf-ish frequencies: key i appears (i+1) times for i in 0..99.
    rows = spark.range(100).select(
        F.col("id").alias("key"), (F.col("id") + 1).alias("n")
    )
    df = rows.select(F.explode(F.sequence(F.lit(1), F.col("n"))).alias("_"), "key")
    counters = cms_counters(df, "key", depth=4, width=1024)
    probes = spark.range(100).select(F.col("id").alias("key"))
    est = {
        r.key: r.cms_estimate
        for r in cms_estimate(counters, probes, "key", depth=4, width=1024).collect()
    }
    for i in range(100):
        true = i + 1
        assert est[i] >= true  # CMS never underestimates
        # 5050 total increments over width 1024 → expected collision
        # inflation per cell ~5; generous bound
        assert est[i] <= true + 60


def test_cms_counter_table_bounded_by_sketch_size(spark):
    # The counter table must never exceed depth × width rows no matter
    # how many input rows were counted.
    df = spark.range(50_000).select((F.col("id") % 3000).alias("key"))
    n = cms_counters(df, "key", depth=4, width=256).count()
    assert n <= 4 * 256


def test_cms_absent_probe_small_estimate(spark):
    # A probe key never inserted gets only collision mass (possibly 0).
    df = spark.range(1000).select(F.col("id").alias("key"))
    counters = cms_counters(df, "key", depth=4, width=1024)
    probes = spark.createDataFrame([(10_000_000,)], "key long")
    est = cms_estimate(counters, probes, "key", depth=4, width=1024).collect()[0]
    assert 0 <= est.cms_estimate <= 10


def test_kmv_insensitive_to_duplication(spark):
    # Duplicated input rows must not move the estimate (DISTINCT-ness).
    base = spark.range(500).select(F.lit("g").alias("g"), F.col("id").alias("key"))
    dup = base.union(base).union(base)
    a = kmv_distinct(base, "key", ["g"], k=32).collect()[0]
    b = kmv_distinct(dup, "key", ["g"], k=32).collect()[0]
    assert a.distinct_estimate == b.distinct_estimate
    assert a.kth_hash == b.kth_hash


# -- property-based: the sketches' core guarantees over arbitrary inputs --

from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=10, deadline=None)
@given(
    keys=st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=60)
)
def test_cms_point_estimate_never_below_true_count(spark, keys):
    df = spark.createDataFrame([(k,) for k in keys], "key long")
    counters = cms_counters(df, "key", depth=4, width=64)
    probes = spark.createDataFrame([(k,) for k in set(keys)], "key long")
    est = {
        r.key: r.cms_estimate
        for r in cms_estimate(counters, probes, "key", depth=4, width=64).collect()
    }
    from collections import Counter

    true = Counter(keys)
    for k, n in true.items():
        assert est[k] >= n  # the count-min guarantee
        assert est[k] <= len(keys)  # a cell can never exceed total inserts


@settings(max_examples=10, deadline=None)
@given(
    keys=st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=60)
)
@pytest.mark.slow  # >10 s; runs in the full suite
def test_hll_exactness_regime_and_duplication_invariance(spark, keys):
    df = spark.createDataFrame([(k,) for k in keys + keys], "key long").select(
        F.lit("g").alias("g"), "key"
    )
    row = hll_distinct(df, "key", ["g"], p=6).collect()[0]
    # ≤60 distinct keys over 64 registers sits in the linear-counting /
    # near-exact regime unless registers collide; duplication never
    # moves the estimate (asserted by construction: input is keys×2)
    single = (
        hll_distinct(
            spark.createDataFrame([(k,) for k in keys], "key long").select(
                F.lit("g").alias("g"), "key"
            ),
            "key",
            ["g"],
            p=6,
        ).collect()[0]
    )
    assert row.distinct_estimate == single.distinct_estimate
    assert row.nonzero_buckets == single.nonzero_buckets
    n_distinct = len(set(keys))
    assert abs(row.distinct_estimate - n_distinct) <= max(6, 0.35 * n_distinct)


def test_kmv_overlap_estimates_segment_intersection(spark):
    from kafkastreamsinteractivequeries_spark.operators.sketches import kmv_overlap

    # segments: A = 0..999, B = 500..1499 → |A∪B| = 1500, |A∩B| = 500,
    # jaccard = 1/3
    a = spark.range(0, 1000).select(F.lit("A").alias("seg"), F.col("id").alias("u"))
    b = spark.range(500, 1500).select(F.lit("B").alias("seg"), F.col("id").alias("u"))
    out = kmv_overlap(a.union(b), "u", "seg", k=64).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.group_a, r.group_b) == ("A", "B")
    # KMV RSE ~ 1/sqrt(k-1) ≈ 12.6%; allow ~4σ on each estimate
    assert abs(r.union_estimate - 1500) / 1500 < 0.5
    assert abs(r.jaccard_estimate - 1 / 3) < 0.25
    assert abs(r.intersection_estimate - 500) / 500 < 0.75
    assert 0 < r.n_both < 64


def test_kmv_overlap_disjoint_and_identical_segments(spark):
    from kafkastreamsinteractivequeries_spark.operators.sketches import kmv_overlap

    a = spark.range(0, 500).select(F.lit("A").alias("seg"), F.col("id").alias("u"))
    c = spark.range(10_000, 10_500).select(
        F.lit("C").alias("seg"), F.col("id").alias("u")
    )
    dup = spark.range(0, 500).select(F.lit("D").alias("seg"), F.col("id").alias("u"))
    out = {
        (r.group_a, r.group_b): r
        for r in kmv_overlap(a.union(c).union(dup), "u", "seg", k=32).collect()
    }
    assert out[("A", "C")].jaccard_estimate == 0.0
    assert out[("A", "C")].intersection_estimate == 0.0
    # identical segments: every k-set hash is in both → jaccard exactly 1
    assert out[("A", "D")].jaccard_estimate == 1.0
    assert len(out) == 3  # all unordered pairs


def test_sketches_exclude_null_keys_like_count_distinct(spark):
    """NULL keys must not count: SQL COUNT(DISTINCT) excludes them, and
    a null hash would otherwise sort first into KMV's k-minima and
    register a spurious HLL bucket."""
    from pyspark.sql import functions as F

    from kafkastreamsinteractivequeries_spark.operators.sketches import (
        hll_distinct,
        kmv_distinct,
    )

    df = spark.createDataFrame(
        [(None, "g"), (5, "g"), (7, "g"), (5, "g")], "v long, g string"
    )
    kmv = kmv_distinct(df, "v", ["g"], k=4).collect()[0]
    assert kmv.n_kept == 2 and kmv.distinct_estimate == 2.0
    hll = hll_distinct(df, "v", ["g"]).collect()[0]
    exact = df.agg(F.countDistinct("v")).collect()[0][0]
    assert exact == 2
    assert abs(hll.distinct_estimate - exact) < 1.0


def test_mg_heavy_hitters_guarantees(spark):
    """Misra-Gries contract: every item with true count > n/(k+1)
    survives, estimates never exceed the truth and underestimate by at
    most n/(k+1) — across partitionings (the estimates may differ, the
    GUARANTEE may not)."""
    from kafkastreamsinteractivequeries_spark.operators.sketches import (
        mg_heavy_hitters,
    )

    # adversarial mix: two heavy items in a sea of 400 singletons
    rows = (
        [("hot",)] * 300
        + [("warm",)] * 120
        + [(f"noise{i}",) for i in range(400)]
    )
    n, k = len(rows), 8
    bound = n // (k + 1)
    truth = {"hot": 300, "warm": 120}

    for parts in (1, 13):
        df = spark.createDataFrame(rows, "item string").repartition(parts)
        out = {
            r["item"]: r
            for r in mg_heavy_hitters(df, "item", k=k).collect()
        }
        for item, true_c in truth.items():
            assert true_c > bound  # the scenario really is above threshold
            assert item in out, (parts, item)
            est = out[item]["estimate"]
            assert true_c - bound <= est <= true_c, (parts, item, est)
            assert out[item]["error_bound"] == bound
            assert out[item]["n_total"] == n


def test_mg_heavy_hitters_grouped(spark):
    from kafkastreamsinteractivequeries_spark.operators.sketches import (
        mg_heavy_hitters,
    )

    rows = [("a", "x")] * 50 + [("a", f"n{i}") for i in range(20)] + [
        ("b", "y")
    ] * 30
    df = spark.createDataFrame(rows, "g string, item string")
    out = mg_heavy_hitters(df, "item", k=4, group_col="g").collect()
    byg = {}
    for r in out:
        byg.setdefault(r["g"], {})[r["item"]] = r
    assert "x" in byg["a"] and byg["a"]["x"]["n_total"] == 70
    assert "y" in byg["b"] and byg["b"]["y"]["estimate"] <= 30
    assert byg["b"]["y"]["estimate"] >= 30 - 30 // 5


def test_hashed_quantile_sketch_exact_small_and_deterministic(spark):
    """n <= k means S = 0: the sketch IS the exact value histogram;
    construction is partitioning-invariant (pure function of the
    multiset)."""
    from kafkastreamsinteractivequeries_spark.operators.sketches import (
        hashed_quantile_estimates,
        hashed_quantile_sketch,
    )

    rows = [(i, i % 7) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, v long")
    sk = {r["value"]: r["weight"] for r in hashed_quantile_sketch(df, "v", k=256).collect()}
    assert sk == {x: (100 // 7 + (1 if x < 100 % 7 else 0)) for x in range(7)}
    sk2 = {
        r["value"]: r["weight"]
        for r in hashed_quantile_sketch(
            spark.createDataFrame(rows, "id long, v long").repartition(9), "v", k=256
        ).collect()
    }
    assert sk == sk2
    est = {r["percentile"]: r["value"] for r in hashed_quantile_estimates(
        hashed_quantile_sketch(df, "v", k=256)
    ).collect()}
    # exact quantiles of 0..6 repeated ~evenly
    assert est[50] == 3 and est[25] == 1 and est[90] == 6


def test_hashed_quantile_sketch_error_bound_and_skew(spark):
    """Sampled regime: estimates stay within the documented expected
    rank error, and a value holding half the mass is NEVER lost (its
    high count bits are always kept) — the skew guarantee a uniform
    sampler lacks."""
    from kafkastreamsinteractivequeries_spark.operators.sketches import (
        hashed_quantile_estimates,
        hashed_quantile_sketch,
    )

    n = 20_000
    rows = [(i, i % 1000) for i in range(n)]          # uniform over 0..999
    rows += [(n + i, 500) for i in range(n)]          # value 500 = half the mass
    df = spark.createDataFrame(rows, "id long, v long")
    sk = hashed_quantile_sketch(df, "v", k=256)
    skm = {r["value"]: r["weight"] for r in sk.collect()}
    assert 500 in skm
    # value 500 carries ~n+20 copies; kept weight within 25%
    assert abs(skm[500] - (n + 20)) <= (n + 20) * 0.25
    est = {r["percentile"]: r["value"] for r in hashed_quantile_estimates(sk).collect()}
    # true p50 = 500 exactly (the heavy value spans ranks ~25%..75%);
    # true p25 is ALSO 500 (cum mass below 500 is 10000 < 25% of
    # 40020) — the sketch may land just under on sampling noise
    assert est[50] == 500
    assert 400 <= est[25] <= 500
    # true p90: ~5978 of the uniform tail past 500 -> ~value 798
    assert 700 <= est[90] <= 900


def test_hashed_quantile_sketch_merge(spark):
    """Merging is deterministic (same pair twice -> bit-identical) and
    the merged estimates stay inside the error corridor of the true
    combined distribution, for both disjoint and overlapping value
    sets."""
    from kafkastreamsinteractivequeries_spark.operators.sketches import (
        hashed_quantile_estimates,
        hashed_quantile_sketch,
        merge_hashed_quantile_sketches,
    )

    lo = spark.createDataFrame([(i, i % 500) for i in range(10_000)], "id long, v long")
    hi = spark.createDataFrame(
        [(i, 500 + i % 500) for i in range(10_000)], "id long, v long"
    )
    k = 128
    merged = merge_hashed_quantile_sketches(
        hashed_quantile_sketch(lo, "v", k=k),
        hashed_quantile_sketch(hi, "v", k=k),
        k=k,
    )
    again = merge_hashed_quantile_sketches(
        hashed_quantile_sketch(lo, "v", k=k),
        hashed_quantile_sketch(hi, "v", k=k),
        k=k,
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, again.collect())
    )
    # union is uniform over 0..999: merged estimates near the truth
    est = {
        r["percentile"]: r["value"]
        for r in hashed_quantile_estimates(merged).collect()
    }
    assert abs(est[50] - 500) <= 120 and abs(est[25] - 250) <= 120
    # overlapping halves: same distribution, estimates agree loosely
    m2 = merge_hashed_quantile_sketches(
        hashed_quantile_sketch(lo, "v", k=k),
        hashed_quantile_sketch(lo, "v", k=k),
        k=k,
    )
    est2 = {r["percentile"]: r["value"] for r in hashed_quantile_estimates(m2).collect()}
    assert abs(est2[50] - 250) <= 100


def test_kll_sketch_guarantee_and_merge(spark):
    """KLL: rank error of every estimated quantile within the O(n/k)
    corridor on uniform and skewed data; min/max present; re-running
    the same partitioning reproduces the sketch (md5 selector); the
    sketch is ~k-bounded, not n-bounded."""
    from kafkastreamsinteractivequeries_spark.operators.sketches import (
        kll_quantiles,
        kll_sketch,
    )

    n, k = 20_000, 128
    vals = [(i, float((i * 7919) % n)) for i in range(n)]  # shuffled uniform
    df = spark.createDataFrame(vals, "id long, v double").repartition(8)
    sk = kll_sketch(df, "v", k=k)
    assert sk.count() <= 12 * k  # bounded summary, not the data
    qs = kll_quantiles(sk, (0.25, 0.5, 0.75, 0.9))
    for q, est in qs.items():
        true_rank = q * n
        est_rank = sum(1 for _i, v in vals if v <= est)
        assert abs(est_rank - true_rank) <= 8 * n / k, (q, est)
    # determinism under a fixed layout
    sk2 = kll_sketch(spark.createDataFrame(vals, "id long, v double").repartition(8), "v", k=k)
    assert sorted(map(tuple, sk.collect())) == sorted(map(tuple, sk2.collect()))
    # heavy skew: half the mass on one value — p50 must hit it
    sk3 = kll_sketch(
        spark.createDataFrame(
            [(i, 42.0 if i % 2 == 0 else float(i % 1000) + 1000.0) for i in range(n)],
            "id long, v double",
        ),
        "v",
        k=k,
    )
    assert kll_quantiles(sk3, (0.25,))[0.25] == 42.0

"""Tests for operators/layout.py (Z-order clustering)."""

import shutil
import tempfile

from pyspark.sql import functions as F

from kafkastreamsinteractivequeries_spark.operators.layout import (
    cluster_by_zorder,
    file_stat_tightness,
    normalize_to_bits,
    zorder_key,
)


def _py_zkey(vals: list[int], bits: int) -> int:
    z = 0
    for j, v in enumerate(vals):
        for i in range(bits):
            z |= ((v >> i) & 1) << (i * len(vals) + j)
    return z


def test_zorder_key_matches_bit_twiddling_reference(spark):
    df = spark.range(256).select(
        (F.col("id") % 16).alias("x"), (F.col("id") / 16).cast("long").alias("y")
    )
    got = {
        (r.x, r.y): r.z
        for r in df.withColumn(
            "z", zorder_key([F.col("x"), F.col("y")], bits=4)
        ).collect()
    }
    for (x, y), z in got.items():
        assert z == _py_zkey([x, y], 4), (x, y)


def test_zorder_key_three_dims(spark):
    df = spark.createDataFrame(
        [(1, 2, 3), (7, 0, 5)], "x long, y long, w long"
    )
    rows = df.withColumn(
        "z", zorder_key([F.col("x"), F.col("y"), F.col("w")], bits=3)
    ).collect()
    for r in rows:
        assert r.z == _py_zkey([r.x, r.y, r.w], 3)


def test_normalize_clamps_and_scales(spark):
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (50.0,), (100.0,), (200.0,)], "v double"
    )
    vals = [
        r.n
        for r in df.select(
            normalize_to_bits(F.col("v"), 0.0, 100.0, bits=8).alias("n")
        ).collect()
    ]
    assert vals[0] == 0  # clamped below
    assert vals[1] == 0
    assert vals[2] == 127  # mid-scale
    assert vals[3] == 255  # top of grid
    assert vals[4] == 255  # clamped above


def test_cluster_by_zorder_tightens_stats_on_both_dims(spark):
    # Uniform 2-D data: an unclustered write leaves every row group
    # spanning ~the whole domain in both dims; the Z-layout shrinks the
    # mean normalized span on BOTH dimensions substantially.
    n = 200_000
    df = spark.range(n).select(
        (F.col("id") * 48271 % 100_000).alias("a"),
        (F.col("id") * 16807 % 100_000).alias("b"),
    )
    plain_dir = tempfile.mkdtemp()
    z_dir = tempfile.mkdtemp()
    try:
        df.repartition(16).write.mode("overwrite").parquet(plain_dir)
        cluster_by_zorder(
            df,
            [("a", 0, 100_000), ("b", 0, 100_000)],
            bits=12,
            num_partitions=16,
        ).drop("_zkey").write.mode("overwrite").parquet(z_dir)

        plain = file_stat_tightness(plain_dir, ["a", "b"])
        clustered = file_stat_tightness(z_dir, ["a", "b"])
        # hash-partitioned layout: every file spans ~the full domain
        assert plain["a"] > 0.9 and plain["b"] > 0.9
        # Z-order over 16 files in 2-D: ideal span ~16^(-1/2) = 0.25;
        # allow generous slack for boundary files
        assert clustered["a"] < 0.5, clustered
        assert clustered["b"] < 0.5, clustered
    finally:
        shutil.rmtree(plain_dir, ignore_errors=True)
        shutil.rmtree(z_dir, ignore_errors=True)


def test_zorder_preserves_rows(spark):
    df = spark.range(10_000).select(
        F.col("id").alias("a"), (F.col("id") % 97).alias("b")
    )
    out = cluster_by_zorder(df, [("a", 0, 10_000), ("b", 0, 97)], bits=10)
    assert out.count() == 10_000
    assert out.select(F.sum("a")).collect()[0][0] == sum(range(10_000))


def _py_hilbert(bits: int, x: int, y: int) -> int:
    s = 2 ** (bits - 1)
    d = 0
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_key_matches_textbook_reference(spark):
    from kafkastreamsinteractivequeries_spark.operators.layout import with_hilbert_key

    df = spark.range(256).select(
        (F.col("id") % 16).alias("x"), (F.col("id") / 16).cast("long").alias("y")
    )
    got = {
        (r.x, r.y): r._hkey
        for r in with_hilbert_key(df, "x", "y", bits=4).collect()
    }
    for (x, y), h in got.items():
        assert h == _py_hilbert(4, x, y), (x, y)
    # the 4-bit curve is a bijection over the 16x16 grid
    assert sorted(got.values()) == list(range(256))


def test_hilbert_key_wide_bits_and_strides(spark):
    from kafkastreamsinteractivequeries_spark.operators.layout import with_hilbert_key

    df = spark.range(200).select(
        ((F.col("id") * 37) % 65536).alias("x"),
        ((F.col("id") * 91) % 65536).alias("y"),
    )
    rows = with_hilbert_key(df, "x", "y", bits=16).collect()
    for r in rows:
        assert r._hkey == _py_hilbert(16, r.x, r.y)


def test_hilbert_curve_is_grid_adjacent(spark):
    from kafkastreamsinteractivequeries_spark.operators.layout import with_hilbert_key

    df = spark.range(64).select(
        (F.col("id") % 8).alias("x"), (F.col("id") / 8).cast("long").alias("y")
    )
    by_key = sorted(
        with_hilbert_key(df, "x", "y", bits=3).collect(), key=lambda r: r._hkey
    )
    for a, b in zip(by_key, by_key[1:]):
        assert abs(a.x - b.x) + abs(a.y - b.y) == 1  # no Z-order jumps


def test_cluster_by_hilbert_tightens_stats_on_both_dims(spark):
    from kafkastreamsinteractivequeries_spark.operators.layout import (
        cluster_by_hilbert,
        file_stat_tightness,
    )

    n = 200_000
    df = spark.range(n).select(
        (F.col("id") * 48271 % 100_000).alias("a"),
        (F.col("id") * 16807 % 100_000).alias("b"),
    )
    out_dir = tempfile.mkdtemp()
    try:
        cluster_by_hilbert(
            df, ("a", 0, 100_000), ("b", 0, 100_000), bits=12, num_partitions=16
        ).drop("_hkey").write.mode("overwrite").parquet(out_dir)
        tight = file_stat_tightness(out_dir, ["a", "b"])
        assert tight["a"] < 0.5, tight
        assert tight["b"] < 0.5, tight
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def _scan_output_rows(q):
    q.collect()

    def find_scan(p):
        if "Scan" in p.nodeName():
            return p
        for i in range(p.children().length()):
            r = find_scan(p.children().apply(i))
            if r is not None:
                return r
        return None

    scan = find_scan(q._jdf.queryExecution().executedPlan())
    return scan.metrics().apply("numOutputRows").value()


def test_zorder_layout_prunes_row_groups_at_scan_time(spark):
    # The point of the layout: a selective filter on EITHER dimension
    # must skip most row groups at the parquet reader, visible as the
    # scan node emitting far fewer rows than the table holds.
    from kafkastreamsinteractivequeries_spark.operators.layout import cluster_by_zorder

    n = 400_000
    df = spark.range(n).select(
        (F.col("id") * 48271 % 100_000).alias("a"),
        (F.col("id") * 16807 % 100_000).alias("b"),
    )
    plain_dir, z_dir = tempfile.mkdtemp(), tempfile.mkdtemp()
    try:
        df.repartition(16).write.mode("overwrite").parquet(plain_dir)
        cluster_by_zorder(
            df, [("a", 0, 100_000), ("b", 0, 100_000)], bits=12, num_partitions=16
        ).drop("_zkey").write.mode("overwrite").parquet(z_dir)
        pred = (F.col("b") >= 10_000) & (F.col("b") < 12_000)  # ~2% selectivity
        plain_rows = _scan_output_rows(spark.read.parquet(plain_dir).filter(pred))
        z_rows = _scan_output_rows(spark.read.parquet(z_dir).filter(pred))
        # unclustered: stats prune nothing, the scan reads everything
        assert plain_rows == n
        # clustered: most row groups skip (measured ~23%; assert <50%)
        assert z_rows < n / 2, (plain_rows, z_rows)
    finally:
        shutil.rmtree(plain_dir, ignore_errors=True)
        shutil.rmtree(z_dir, ignore_errors=True)


def test_hilbert_key_top_bit_quadrant_no_overflow(spark):
    # Regression: the level-15 distance increment s*s*((3*rx)^ry) is
    # 3*2^30 > int32 max whenever the top bit of x or y is set — half
    # the bits=16 grid.  Computed in IntegerType this throws
    # ARITHMETIC_OVERFLOW under ANSI (or silently wraps a wrong key).
    from kafkastreamsinteractivequeries_spark.operators.layout import with_hilbert_key

    pts = [(40_000, 1), (1, 40_000), (65_535, 65_535), (32_768, 32_768), (0, 65_535)]
    df = spark.createDataFrame(pts, "x long, y long")
    rows = with_hilbert_key(df, "x", "y", bits=16).collect()
    for r in rows:
        assert r._hkey == _py_hilbert(16, r.x, r.y), (r.x, r.y)


def test_cluster_by_hilbert_defaults_cover_full_domain(spark):
    # cluster_by_hilbert at its DEFAULT bits=16 must survive values that
    # quantize into the top-bit quadrant (the overflow regression).
    from kafkastreamsinteractivequeries_spark.operators.layout import cluster_by_hilbert

    df = spark.range(10_000).select(
        (F.col("id") * 48271 % 100_000).alias("a"),
        (F.col("id") * 16807 % 100_000).alias("b"),
    )
    out = cluster_by_hilbert(df, ("a", 0, 100_000), ("b", 0, 100_000))
    assert out.count() == 10_000
    assert out.select(F.sum("a")).collect()[0][0] == df.select(F.sum("a")).collect()[0][0]


def test_zorder_key_rejects_bit_overflow(spark):
    # 4 dims x 16 bits = 64 key bits > the 63 usable in int64: must be a
    # clear ValueError, not a lit-construction crash or a wrapped key.
    import pytest

    cols = [F.lit(1).cast("long") for _ in range(4)]
    with pytest.raises(ValueError, match="63 usable bits"):
        zorder_key(cols, bits=16)
    # 4 dims x 15 bits = 60 is fine
    zorder_key(cols, bits=15)


# ---------------------------------------------------------------------------
# plan_compaction — sorted-cumulative bin packing over a file manifest
# ---------------------------------------------------------------------------


def _manifest(spark, sf_dir):
    from kafkastreamsinteractivequeries_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.col("n_chars").cast("long").alias("size")
    )


def test_compaction_covers_every_file_once(spark, sf_dir):
    from kafkastreamsinteractivequeries_spark.operators.layout import plan_compaction

    m = _manifest(spark, sf_dir)
    planned = plan_compaction(m, "size", 50_000, partition_by=["lang"])
    assert planned.count() == m.count()
    assert planned.select("doc_id").distinct().count() == m.count()
    # bin_seq is 1..n within each (lang, bin)
    bad = (
        planned.groupBy("lang", "bin_id")
        .agg(F.count("*").alias("n"), F.max("bin_seq").alias("mx"), F.min("bin_seq").alias("mn"))
        .filter((F.col("mx") != F.col("n")) | (F.col("mn") != 1))
        .count()
    )
    assert bad == 0


def test_compaction_bins_reach_target_minus_max_file(spark, sf_dir):
    """Every non-last bin per partition totals > target − max_file_size —
    the packing guarantee an OPTIMIZE job needs (no proliferation of
    under-filled outputs)."""
    from kafkastreamsinteractivequeries_spark.operators.layout import plan_compaction

    target = 50_000
    m = _manifest(spark, sf_dir)
    planned = plan_compaction(m, "size", target, partition_by=["lang"])
    totals = planned.groupBy("lang", "bin_id").agg(F.sum("size").alias("tot"))
    last = planned.groupBy("lang").agg(F.max("bin_id").alias("last_bin"))
    maxf = planned.groupBy("lang").agg(F.max("size").alias("max_size"))
    bad = (
        totals.join(last, "lang")
        .join(maxf, "lang")
        .filter(F.col("bin_id") != F.col("last_bin"))
        .filter(F.col("tot") <= F.lit(target) - F.col("max_size"))
        .count()
    )
    assert bad == 0


def test_compaction_oversized_files_bin_alone(spark):
    from kafkastreamsinteractivequeries_spark.operators.layout import plan_compaction

    rows = [(i, int(s)) for i, s in enumerate([150, 120, 40, 30, 20, 10, 5])]
    m = spark.createDataFrame(rows, "fid long, size long")
    planned = plan_compaction(m, "size", 100).collect()
    by_bin = {}
    for r in planned:
        by_bin.setdefault(r["bin_id"], []).append(r["size"])
    for sizes in by_bin.values():
        if any(s >= 100 for s in sizes):
            assert len(sizes) == 1, f"oversized file shares bin: {sizes}"


def test_compaction_is_one_window_shuffle(spark, sf_dir):
    from kafkastreamsinteractivequeries_spark.operators.layout import plan_compaction

    m = _manifest(spark, sf_dir)
    plan = (
        plan_compaction(m, "size", 50_000, partition_by=["lang"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # both windows hash-partition on lang → one exchange reused
    assert plan.count("Exchange") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_compaction_default_tiebreak_skips_unorderable_columns(spark):
    """A map-typed manifest column (e.g. per-file stats) must not enter
    the default tie-break ordering — maps are unorderable and would
    fail analysis; the plan falls back to the remaining columns."""
    from kafkastreamsinteractivequeries_spark.operators.layout import plan_compaction

    rows = [(f"f{i}", int(s), {"rows": i}) for i, s in enumerate([40, 30, 20, 10])]
    m = spark.createDataFrame(rows, "path string, size long, stats map<string,int>")
    planned = plan_compaction(m, "size", 60).collect()
    assert len(planned) == 4
    # explicit total order via the unique path column is honored too
    explicit = plan_compaction(m, "size", 60, order_by=["size", "path"]).collect()
    assert {r["path"] for r in explicit} == {r["path"] for r in planned}

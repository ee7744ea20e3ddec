"""Data-layout operators: multi-dimensional clustering for scan pruning.

At 100 TB the dominant query cost is the scan, and the dominant scan
saving is FILE/ROW-GROUP SKIPPING off parquet min/max column stats.  A
table range-partitioned by one column has tight stats for that column
only; a query filtering on a *different* column reads everything.
Z-ordering (bit-interleaving the dimensions into one clustering key,
then range-partitioning + sorting by it) makes every participating
column's per-file min/max range shrink like ~n^(-1/d), so predicates on
ANY clustered dimension skip most files — the standard multi-dimensional
layout trick (Databricks OPTIMIZE ZORDER, Iceberg/Hudi clustering).

Everything here is pure Column arithmetic (``//``, ``%``, ``*``, ``+``)
— engine-portable, codegen-friendly, zero shuffle beyond the one
``repartitionByRange`` that IS the layout operation.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F


def normalize_to_bits(
    col: F.Column, lo: float, hi: float, bits: int = 16
) -> F.Column:
    """Scale a numeric column from [lo, hi] onto the integer grid
    [0, 2^bits): the quantization step before bit interleaving.
    Out-of-range values clamp to the grid edges (layout keys must never
    be NULL or negative — a bad key would just cluster imperfectly)."""
    span = float(hi) - float(lo)
    if span <= 0:
        return F.lit(0).cast("long")
    scaled = F.floor(
        (col.cast("double") - F.lit(float(lo))) / F.lit(span) * F.lit(float(2**bits - 1))
    )
    return F.least(F.greatest(scaled, F.lit(0)), F.lit(2**bits - 1)).cast("long")


def zorder_key(dims: list[F.Column], bits: int = 16) -> F.Column:
    """Interleave the low ``bits`` bits of each dimension (already on
    the [0, 2^bits) grid — see ``normalize_to_bits``) into one Z-curve
    key: bit i of dimension j lands at position ``i·d + j``.

    Built as a flat sum of ``bits × d`` terms of the form
    ``((x // 2^i) % 2) · 2^(i·d+j)`` — integer div/mod/multiply only, so
    the whole key is one whole-stage-codegen expression in Spark and the
    identical formula is expressible in any SQL engine (the pytest
    cross-checks it against a Python bit-twiddling reference).
    """
    d = len(dims)
    if d * bits > 63:
        raise ValueError(
            f"zorder_key: {d} dims x {bits} bits = {d * bits} key bits "
            "exceeds the 63 usable bits of a signed int64; reduce bits "
            f"(max {63 // d} for {d} dims) or drop a dimension"
        )
    terms = []
    for j, dim in enumerate(dims):
        for i in range(bits):
            bit = (dim / F.lit(2**i)).cast("long") % 2
            terms.append(bit * F.lit(2 ** (i * d + j)))
    return reduce(lambda a, b: a + b, terms).cast("long")


def with_hilbert_key(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 16,
    key_col: str = "_hkey",
) -> DataFrame:
    """Append the 2-D Hilbert-curve distance of grid cell
    (``x_col``, ``y_col``) — both already on [0, 2^bits) (see
    ``normalize_to_bits``) — as ``key_col``.

    Hilbert ordering dominates Z-order for locality: the curve never
    makes the Z's long diagonal jumps, so adjacent cells stay adjacent
    on the curve almost everywhere and per-file min/max stats come out
    at least as tight (both are offered because Z generalizes trivially
    to d dims while this is the standard 2-D rotate/reflect recursion).

    Physical shape: the bit-serial loop (top bit down, carrying the
    rotated (x, y) state) unrolls into ``bits`` chained PROJECTIONS —
    one narrow select per level — because a single nested expression
    would reference the carried coordinates twice per level and grow
    the Catalyst tree 4^bits.  Catalyst collapses adjacent projections
    into one codegen stage, so the run-time cost is still one map pass;
    the carried coordinates go NEGATIVE after reflections (the textbook
    algorithm relies on two's-complement bit tests there), so rx/ry are
    ``bitwiseAND`` probes — div/mod disagrees with ``&`` on negatives.
    Cross-checked against the textbook Python reference in tests.
    """
    xc, yc, dc = f"{key_col}_x", f"{key_col}_y", key_col
    out = df.withColumns({
        xc: F.col(x_col).cast("long"),
        yc: F.col(y_col).cast("long"),
        dc: F.lit(0).cast("long"),
    })
    for level in range(bits - 1, -1, -1):
        s = 2**level
        x, y = F.col(xc), F.col(yc)
        rx = F.when(x.bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0))
        ry = F.when(y.bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0))
        flip = (ry == 0) & (rx == 1)
        nx = F.when(flip, F.lit(s - 1) - x).otherwise(x)
        ny = F.when(flip, F.lit(s - 1) - y).otherwise(y)
        # s*s is computed in Python and cast to long: at level 15 the
        # IntegerType product 3*2^30 would overflow int32 (ANSI throws
        # for any coordinate with the top bit set; non-ANSI wraps to a
        # wrong key), so the whole increment must live in LongType.
        out = out.withColumns({
            dc: F.col(dc)
            + F.lit(s * s).cast("long") * (3 * rx).bitwiseXOR(ry).cast("long"),
            xc: F.when(ry == 0, ny).otherwise(nx),
            yc: F.when(ry == 0, nx).otherwise(ny),
        })
    return out.drop(xc, yc)


def cluster_by_hilbert(
    df: DataFrame,
    x_dim: tuple[str, float, float],
    y_dim: tuple[str, float, float],
    bits: int = 16,
    num_partitions: int | None = None,
    key_col: str = "_hkey",
) -> DataFrame:
    """``cluster_by_zorder``'s 2-D Hilbert twin: quantize both
    dimensions, append the curve key, range-partition + sort by it.
    Same one-shuffle write-time cost, strictly better worst-case
    locality."""
    quantized = df.withColumns({
        f"{key_col}_qx": normalize_to_bits(F.col(x_dim[0]), x_dim[1], x_dim[2], bits),
        f"{key_col}_qy": normalize_to_bits(F.col(y_dim[0]), y_dim[1], y_dim[2], bits),
    })
    keyed = with_hilbert_key(
        quantized, f"{key_col}_qx", f"{key_col}_qy", bits, key_col
    ).drop(f"{key_col}_qx", f"{key_col}_qy")
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    return keyed.repartitionByRange(n, key_col).sortWithinPartitions(key_col)


def cluster_by_zorder(
    df: DataFrame,
    dims: list[tuple[str, float, float]],
    bits: int = 16,
    num_partitions: int | None = None,
    key_col: str = "_zkey",
) -> DataFrame:
    """Re-layout ``df`` along the Z-curve of ``dims`` (each a
    ``(column, lo, hi)`` bound triple): compute the interleaved key,
    range-partition by it, and sort within partitions, so a subsequent
    parquet write produces files whose min/max stats are TIGHT in every
    clustered dimension.

    Scale shape: ONE range-partitioning shuffle (the same cost as any
    global sort-write) buys file skipping on d dimensions forever after;
    the key arithmetic is map-side codegen.  ``repartitionByRange``
    samples the key to pick boundaries — acceptable here because layout
    is a one-shot WRITE operation, not a reproducible query (the
    boundary nondeterminism lesson from ``curation.cumulative_sum``
    doesn't apply: any boundary split yields the same stats tightness).

    Bounds are caller-supplied rather than computed: at 100 TB the
    min/max of a layout dimension is domain knowledge (timestamps,
    id ranges) or one cheap stats query — baking the aggregation in
    here would force a second full scan before every write.
    """
    key = zorder_key(
        [normalize_to_bits(F.col(c), lo, hi, bits) for c, lo, hi in dims], bits
    )
    out = df.withColumn(key_col, key)
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    return out.repartitionByRange(n, key_col).sortWithinPartitions(key_col)


def plan_compaction(
    manifest: DataFrame,
    size_col: str,
    target_bytes: int,
    partition_by: list[str] | None = None,
    order_by: list[str] | None = None,
    bin_col: str = "bin_id",
) -> DataFrame:
    """Assign every file in a manifest to a compaction bin of roughly
    ``target_bytes`` — the planning half of an OPTIMIZE/compaction job
    (the execution half is a read of each bin's files and one coalesced
    write, engine-specific and out of scope here).

    Algorithm: within each table partition (``partition_by``), order
    files deterministically (``order_by``, default descending size with
    the remaining manifest columns as tie-break) and assign
    ``bin = floor(exclusive-prefix-sum(size) / target)``.  This is the
    sorted-cumulative approximation of first-fit-decreasing: exact FFD
    is inherently sequential (each placement depends on every earlier
    bin's residual capacity), while the prefix-sum form is ONE window
    shuffle and provably never builds a bin smaller than ``target`` −
    max_file_size except the last per partition — the guarantee
    OPTIMIZE-style jobs actually need.  Oversized files (≥ target) land
    alone in their own bin because the prefix sum jumps past a whole
    bin width.

    Scale shape: manifests are millions of rows at 100 TB (one per
    file), so a per-partition window sort is tiny next to the data it
    reorganizes; output adds ``bin_col`` plus ``bin_seq`` (position
    within the bin) and keeps every manifest column.

    Determinism contract: bin assignment is only stable across runs and
    engines if the ordering is a TOTAL order — i.e. it ends in a unique
    key.  Pass ``order_by`` ending in the manifest's unique file
    identifier (e.g. the file path).  The default ordering tie-breaks
    on every remaining orderable manifest column, which is total in
    practice because real manifests carry a unique path column — but if
    rows collide under that combination, which files share a bin
    becomes engine/run-dependent (bin SIZES stay within the guarantee
    either way).  Unorderable column types (maps) are skipped from the
    default tie-break rather than failing analysis.
    """
    from pyspark.sql import Window

    parts = partition_by or []
    if order_by:
        ordering = [F.col(c) for c in order_by]
    else:
        orderable = {
            c: t for c, t in manifest.dtypes if not t.startswith("map<")
        }
        tiebreak = [c for c in orderable if c != size_col and c not in parts]
        ordering = [F.col(size_col).desc(), *[F.col(c) for c in tiebreak]]
    w = Window.partitionBy(*parts).orderBy(*ordering)
    excl = F.coalesce(
        F.sum(size_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    binned = manifest.withColumn(
        bin_col, F.floor(excl / F.lit(target_bytes)).cast("long")
    )
    seq = Window.partitionBy(*parts, bin_col).orderBy(*ordering)
    return binned.withColumn("bin_seq", F.row_number().over(seq))


def file_stat_tightness(
    spark_df_path: str,
    columns: list[str],
) -> dict[str, float]:
    """Layout-quality metric: for each column, the mean per-row-group
    (max-min) span across the parquet files at ``spark_df_path``,
    normalized by the global span — 1.0 means every row group covers the
    whole domain (no skipping possible), ~(row_groups)^(-1/d) is the
    Z-order ideal.  Driver-side metadata read only (parquet footers, no
    data pages) — this is telemetry for layout jobs, not a query path.
    """
    import glob
    import os

    import pyarrow.parquet as pq

    spans: dict[str, list[tuple[float, float]]] = {c: [] for c in columns}
    for f in glob.glob(os.path.join(spark_df_path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                name = col.path_in_schema
                if name in spans and col.statistics is not None:
                    spans[name].append(
                        (float(col.statistics.min), float(col.statistics.max))
                    )
    out: dict[str, float] = {}
    for c, ranges in spans.items():
        if not ranges:
            out[c] = float("nan")
            continue
        global_lo = min(lo for lo, _ in ranges)
        global_hi = max(hi for _, hi in ranges)
        width = global_hi - global_lo
        if width <= 0:
            out[c] = 0.0
            continue
        out[c] = sum(hi - lo for lo, hi in ranges) / len(ranges) / width
    return out

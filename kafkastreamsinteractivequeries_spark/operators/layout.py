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
    terms = []
    for j, dim in enumerate(dims):
        for i in range(bits):
            bit = (dim / F.lit(2**i)).cast("long") % 2
            terms.append(bit * F.lit(2 ** (i * d + j)))
    return reduce(lambda a, b: a + b, terms).cast("long")


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

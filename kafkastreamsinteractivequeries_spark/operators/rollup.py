"""Mergeable partial aggregates — continuous-aggregate MAINTENANCE at
100 TB scale.

Reference parity: the reference's T5 continuous aggregate
(``StreamsCountAndSum.java`` topology; materialized by T6 into the
``stock-aggregations`` store) keeps ONE running aggregate per key that
Kafka Streams updates record-at-a-time.  At 100 TB that story needs a
second half the reference never reaches: once partial aggregates are
LANDED at a fine grain (hour/day partitions of a warehouse table), every
coarser read — daily, monthly, all-time — must be answered by MERGING
the landed partials, never by re-reading raw events.  That is the
TimescaleDB continuous-aggregate / Druid rollup contract, and it only
works for aggregates that form a commutative monoid: count, sum, min,
max, sum-of-squares (for mean/variance), and sketch registers (HLL/KMV,
see ``sketches.py``).

Design:

- ``partial_aggregate`` emits the MERGEABLE STATE, one row per
  (keys…, grain bucket): ``_n`` plus ``{col}_{sum,min,max,sumsq}``
  columns.  Catalyst plans it as partial_agg → exchange → final_agg, so
  the shuffle already moves merged state, one skinny row per group per
  map task.
- ``merge_partials`` re-aggregates partials to a coarser grain (or
  all-time) and is SCHEMA-DRIVEN: the merge operator for each column is
  carried by its name suffix (``*_sum``/``*_sumsq``/``_n`` ⇒ SUM,
  ``*_min`` ⇒ MIN, ``*_max`` ⇒ MAX), so merging needs no measure spec
  and cannot drift from how the partial was built.  Its input is the
  partials table — at 100 TB that's orders of magnitude smaller than
  raw, and the merge is one shuffle over it.
- ``finalize`` derives the non-mergeable readouts (mean, variance) from
  merged state: ``avg = sum/n``, ``var = sumsq/n - (sum/n)²`` — the
  standard parallel-variance identity, exact over merged partials.
- HLL register tables (``sketches.hll_registers``) merge the same way:
  ``merge_hll_registers`` folds a finer-grain register table with
  ``MAX(reg)`` per (group, bucket), which is EXACTLY the register state
  a direct pass over the union would produce — merged estimates equal
  direct estimates bit-for-bit (driver-verified under
  ``t5_stock_aggregation``'s ``hllmerge`` branch).

Streaming tie-in: ``streaming/pipeline.py``'s T6 materialization lands
per-batch snapshots; those snapshots ARE partials in this sense, and the
register sink already merges with the same ``max(reg)`` fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: agg-name → (builder, merge fn).  ``sumsq`` squares before summing;
#: all states here are commutative monoids so map-side combine merges
#: exactly the way ``merge_partials`` does.
_BUILDERS = {
    "sum": lambda c: F.sum(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
    "sumsq": lambda c: F.sum(F.col(c) * F.col(c)),
}

_MERGE_BY_SUFFIX = {"sum": F.sum, "sumsq": F.sum, "min": F.min, "max": F.max}


def partial_aggregate(
    df: DataFrame,
    keys: list[str],
    time_col: str,
    grain: str,
    measures: dict[str, list[str]],
) -> DataFrame:
    """Aggregate ``df`` to mergeable per-(keys, grain-bucket) state.

    ``measures`` maps a column to the state kinds to keep
    (``sum``/``min``/``max``/``sumsq``); ``_n`` (row count) is always
    emitted.  ``grain`` is any ``date_trunc`` unit (``hour``, ``day``,
    ``week``, …); the bucket column is named ``bucket``.

    One partial-aggregating shuffle over raw; this is the WRITE side of
    the rollup contract — run it once per ingest increment and land the
    output, then answer coarser grains from ``merge_partials``.
    """
    aggs = [F.count("*").alias("_n")]
    for col, kinds in measures.items():
        for kind in kinds:
            aggs.append(_BUILDERS[kind](col).alias(f"{col}_{kind}"))
    bucket = F.date_trunc(grain, F.col(time_col)).alias("bucket")
    return df.groupBy(*[F.col(k) for k in keys], bucket).agg(*aggs)


def merge_partials(
    partials: DataFrame,
    keys: list[str],
    grain: str | None = None,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Merge a partials table (``partial_aggregate`` output, possibly
    unioned across ingest increments) to coarser grain ``grain``, or to
    all-time when ``grain`` is None (the bucket column is dropped).

    Schema-driven: every non-key column's merge operator comes from its
    name suffix, so a partials table always knows how to merge itself.
    Raw data is never touched — ONE shuffle over the (already tiny)
    partials.  Raises on a column whose suffix names no monoid, rather
    than silently mis-merging.
    """
    group = [F.col(k) for k in keys]
    if grain is not None:
        group.append(F.date_trunc(grain, F.col(bucket_col)).alias(bucket_col))
    aggs = []
    for name in partials.columns:
        if name in keys or name == bucket_col:
            continue
        if name == "_n":
            aggs.append(F.sum("_n").alias("_n"))
            continue
        suffix = name.rsplit("_", 1)[-1]
        if suffix not in _MERGE_BY_SUFFIX:
            raise ValueError(
                f"column {name!r} carries no mergeable suffix "
                f"(one of {sorted(_MERGE_BY_SUFFIX)}, or '_n')"
            )
        aggs.append(_MERGE_BY_SUFFIX[suffix](name).alias(name))
    return partials.groupBy(*group).agg(*aggs)


def finalize(
    partials: DataFrame,
    mean_of: list[str] | None = None,
    var_of: list[str] | None = None,
) -> DataFrame:
    """Derive non-mergeable readouts from merged state: ``{col}_avg``
    from ``{col}_sum / _n`` and ``{col}_var`` from the parallel-variance
    identity ``sumsq/n − (sum/n)²``.  Pure column arithmetic — no
    shuffle, no second pass over anything."""
    out = partials
    for col in mean_of or []:
        out = out.withColumn(col + "_avg", F.col(col + "_sum") / F.col("_n"))
    for col in var_of or []:
        mean = F.col(col + "_sum") / F.col("_n")
        out = out.withColumn(
            col + "_var", F.col(col + "_sumsq") / F.col("_n") - mean * mean
        )
    return out


def merge_hll_registers(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge an HLL register table (``sketches.hll_registers`` output)
    down to ``group_cols``: ``MAX(reg)`` per (group…, bucket).  Because
    each register is itself a max over observed ranks, the merged table
    is IDENTICAL to the register table a single pass over the combined
    data would build — feeding ``sketches.hll_estimate`` afterwards
    yields exactly the direct estimate (not an approximation of it)."""
    return regs.groupBy(*group_cols, "bucket").agg(F.max("reg").alias("reg"))

"""Analytics operators over the TPC-H-ish testdata tables.

The reference's query surface has no joins/sorts/top-k (SURVEY.md §2.4)
— its operators are equality / IN-list / range / predicate filters over
a keyed aggregate.  FIXTURES.md §5 maps that surface onto the TPC-H-ish
tables at scale; this module adds the join/aggregation workload a real
analytics engine needs and that `bench.py` measures.

Scale design notes (per-operator):

- ``pricing_summary``: single scan + partial agg; only the 7 needed
  columns are read (column pruning) and the shipdate filter pushes to
  the parquet scan.  Group-key cardinality is tiny → shuffle is a few
  rows per partition.
- ``revenue_by_nation``: the canonical star join.  Dimension tables
  (nation, region) are broadcast — no shuffle for them; the big fact
  join (lineitem ⋈ orders) shuffles on the join key once; AQE picks
  shuffle-hash vs sort-merge and splits skewed partitions.
- ``top_customers_by_segment``: window top-k — one shuffle on the
  partition key, no global sort (rank is computed per partition group).
- ``order_priority_exists``: left-semi join — Spark never materializes
  the right side's payload columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1-style pricing summary (scan + 2-key groupBy + 8 aggs)."""
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def revenue_by_nation(
    lineitem: DataFrame, orders: DataFrame, customer: DataFrame, nation: DataFrame, region: DataFrame
) -> DataFrame:
    """Star join: revenue per customer nation (TPC-H Q5 flavor).

    nation/region are broadcast (tiny dims — 25/5 rows at any SF);
    lineitem ⋈ orders ⋈ customer shuffle on their keys with AQE.
    """
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


def top_customers_by_segment(
    lineitem: DataFrame, orders: DataFrame, customer: DataFrame, k: int = 5
) -> DataFrame:
    """Top-k customers by revenue within each market segment.

    Window top-k: revenue aggregate shuffles on c_custkey, ranking
    shuffles on c_mktsegment only — no global sort.  Ties broken by
    c_custkey for determinism.
    """
    rev = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment", "c_custkey", "c_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("revenue").desc(), F.col("c_custkey"))
    return (
        rev.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("c_mktsegment", "c_custkey", "c_name", "revenue", "rank")
    )


def order_priority_exists(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Orders-per-priority where some lineitem shipped after the order
    date (TPC-H Q4 flavor via left-semi join — EXISTS without
    materializing the right side)."""
    late = lineitem.join(
        orders,
        (lineitem.l_orderkey == orders.o_orderkey) & (lineitem.l_shipdate > orders.o_orderdate),
        "inner",
    ).select("l_orderkey").distinct()
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


def parts_range_filtered(part: DataFrame, lower: str, upper: str, min_size: int) -> DataFrame:
    """The IQ range+predicate surface applied to a dimension table:
    inclusive brand range + row predicate — filter pushdown exercise."""
    return part.filter(
        F.col("p_brand").between(lower, upper) & (F.col("p_size") >= min_size)
    ).select("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")

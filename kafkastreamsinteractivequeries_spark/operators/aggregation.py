"""The core continuous aggregate (T4+T5+T6 in SURVEY.md §2.1).

Reference semantics (``streams/KafkaStreamsService.java:62-74,84-90``):
per symbol, fold each StockTransaction into an aggregate —
``buys += amount`` if ``buy`` else ``sells += amount``;
``number_shares += number_shares`` — materialized into a queryable store.

Spark-first: the fold is a commutative/associative sum, so it is exactly
``groupBy(symbol).agg(sum(when(...)))``.  Catalyst plans it as partial
(map-side) aggregation + a single hash shuffle on the group key + final
aggregation — the distributed analog of Kafka Streams' per-partition
RocksDB fold, with map-side combine the reference doesn't have.  The
same expression runs unchanged under Structured Streaming (see
``streaming.pipeline``), where Spark's state store holds the running
aggregate and ``outputMode("update")`` reproduces the reference's
emit-per-update (statestore cache = 0) behavior.

Scale: one shuffle keyed by ``symbol``; group-key cardinality is small
(ticker symbols), so the aggregate state is tiny regardless of input
size, and partial aggregation means the shuffle moves one row per
(input-partition × symbol), not per input record.  Works unchanged at
100 TB / 1000 executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def aggregate_transactions(txns: DataFrame) -> DataFrame:
    """transactions(symbol, buy, amount, number_shares, ...) →
    aggregation(symbol, buys, sells, number_shares)."""
    return txns.groupBy("symbol").agg(
        F.sum(F.when(F.col("buy"), F.col("amount")).otherwise(F.lit(0.0))).alias("buys"),
        F.sum(F.when(~F.col("buy"), F.col("amount")).otherwise(F.lit(0.0))).alias("sells"),
        F.sum("number_shares").cast("long").alias("number_shares"),
    )

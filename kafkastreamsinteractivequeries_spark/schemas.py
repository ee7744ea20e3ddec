"""Declared schemas for the engine's data model.

The reference's model is a fixed schema declared twice (POJO + proto):
``StockTransaction`` (reference ``model/StockTransaction.java:3-8``) and
``StockTransactionAggregationProto`` (reference
``proto/interactive_query_service.proto:46-51``).  Here both are declared
once as ``StructType``; JSON encode/decode is ``to_json``/``from_json``
(replacing ``streams/SerdeUtil.java:135-167``), and the reference's
8-byte-timestamp value packing (``streams/SerdeUtil.java:53-95``)
becomes an ordinary ``TimestampType`` event-time column.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Input record stream — reference model/StockTransaction.java:3-8 plus an
# explicit event-time column (the Kafka record timestamp in the reference).
STOCK_TRANSACTION_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType(), False),
        T.StructField("buy", T.BooleanType(), False),
        T.StructField("amount", T.DoubleType(), False),
        # snake_case for the reference's `numberShares` (proto field is
        # `number_shares` too — interactive_query_service.proto:50)
        T.StructField("number_shares", T.IntegerType(), False),
        T.StructField("event_time", T.TimestampType(), True),
    ]
)

# Aggregate / serving-table record — reference proto
# interactive_query_service.proto:46-51 (symbol, buys, sells, number_shares).
STOCK_AGGREGATION_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType(), False),
        T.StructField("buys", T.DoubleType(), False),
        T.StructField("sells", T.DoubleType(), False),
        T.StructField("number_shares", T.LongType(), False),
    ]
)

# Driver testdata `events` table (TESTDATA.md) — plays the role of the
# stock-transaction stream (FIXTURES.md §5).
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("props", T.StringType(), True),
    ]
)

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — one entry per implemented operator from SURVEY.md §2.
``oracle_sql()`` — DuckDB-dialect equivalent for each query.

Floating-point policy: every double-valued aggregate is rounded to 2
decimals IN BOTH the Spark query and the oracle SQL, so the driver's
value-hash comparison is stable against summation-order differences.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from kafkastreamsinteractivequeries_spark.operators.aggregation import aggregate_transactions
from kafkastreamsinteractivequeries_spark.operators.windows import windowed_aggregate
from kafkastreamsinteractivequeries_spark.plans.queries import (
    FilteredRangeQuery,
    KeyQuery,
    MultiKeyQuery,
    RangeQuery,
)
from kafkastreamsinteractivequeries_spark.plans.service import InteractiveQueryService
from kafkastreamsinteractivequeries_spark.sources.tables import (
    load_table,
    transactions_from_events,
)

# ---------------------------------------------------------------------------
# Serving table: the reference's stock-aggregation state store rebuilt from
# the testdata `events` stream table (FIXTURES.md §5 mapping).
# ---------------------------------------------------------------------------


def _serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    agg = aggregate_transactions(transactions_from_events(events))
    return agg.select(
        "symbol",
        F.round("buys", 2).alias("buys"),
        F.round("sells", 2).alias("sells"),
        "number_shares",
    )


def _service(spark: SparkSession, sf_dir: str) -> InteractiveQueryService:
    return InteractiveQueryService(_serving(spark, sf_dir))


# DuckDB oracle CTE mirroring _serving exactly (same rounding).
_ORACLE_AGG_CTE = """
WITH txns AS (
  SELECT event_type AS symbol,
         (user_id % 2 = 0) AS buy,
         value AS amount,
         CAST(json_extract_string(props, '$.k') AS INTEGER) AS number_shares,
         ts AS event_time
  FROM events
),
agg AS (
  SELECT symbol,
         ROUND(SUM(CASE WHEN buy THEN amount ELSE 0.0 END), 2) AS buys,
         ROUND(SUM(CASE WHEN NOT buy THEN amount ELSE 0.0 END), 2) AS sells,
         CAST(SUM(number_shares) AS BIGINT) AS number_shares
  FROM txns GROUP BY symbol
)
"""

# Key universe in the events table: click / error / purchase / signup / view.


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the continuous per-key conditional-sum aggregate (T5)."""
    return _serving(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # T5 — the materialized continuous aggregate itself.
    q["t5_stock_aggregation"] = _serving

    # Q1 — key query (point lookup), StockController.java:186-206.
    q["q1_key_query"] = lambda s, d: _service(s, d).execute(KeyQuery.with_key("purchase"))

    # Q2 — multi-key query, query/MultiKeyQuery.java:9-51.
    q["q2_multikey_query"] = lambda s, d: _service(s, d).execute(
        MultiKeyQuery.with_keys(["click", "purchase", "signup"])
    )

    # Q3 — range query, 4 bound variants, query/QueryUtils.java:19-27.
    q["q3_range_query"] = lambda s, d: _service(s, d).execute(
        RangeQuery.with_range("click", "signup")
    )
    q["q3_range_lower_only"] = lambda s, d: _service(s, d).execute(
        RangeQuery.with_lower_bound("error")
    )
    q["q3_range_upper_only"] = lambda s, d: _service(s, d).execute(
        RangeQuery.with_upper_bound("purchase")
    )

    # Q6 — full scan (RangeQuery.withNoBounds), StoreDelegate.java:87-89.
    q["q6_full_scan"] = lambda s, d: _service(s, d).execute(RangeQuery.with_no_bounds())

    # Q4 — filtered range: JsonPath predicate compiled to a Column,
    # store/CustomQueryStore.java:68-97.
    q["q4_filtered_range"] = lambda s, d: _service(s, d).execute(
        FilteredRangeQuery.with_bounds("click", "view").predicate("@.buys > @.sells")
    )
    q["q4_filtered_range_symbol"] = lambda s, d: _service(s, d).execute(
        FilteredRangeQuery.with_bounds(None, None).predicate("@.symbol == 'purchase'")
    )
    q["q4_filtered_range_numeric"] = lambda s, d: _service(s, d).execute(
        FilteredRangeQuery.with_bounds(None, None).predicate(
            "@.buys > 299 && @.number_shares > 100"
        )
    )

    # Q5 — filtered window range (dead in the reference, implemented
    # here per SURVEY.md §7 step 5): tumbling 1h windows + time bounds
    # + predicate.
    def _windowed(s: SparkSession, d: str) -> DataFrame:
        from kafkastreamsinteractivequeries_spark.sources.tables import (
            transactions_from_events,
        )

        txns = transactions_from_events(load_table(s, d, "events"))
        w = windowed_aggregate(txns, "1 hour")
        return w.select(
            "window_start",
            "window_end",
            "symbol",
            F.round("buys", 2).alias("buys"),
            F.round("sells", 2).alias("sells"),
            "number_shares",
        )

    q["q5_windowed_aggregation"] = _windowed

    def _q5(s: SparkSession, d: str) -> DataFrame:
        from kafkastreamsinteractivequeries_spark.plans.queries import (
            FilteredWindowRangeQuery,
        )

        query = FilteredWindowRangeQuery.with_bounds(
            "2024-01-02 00:00:00", "2024-01-05 00:00:00"
        ).predicate("@.buys > @.sells")
        return query.apply(_windowed(s, d))

    q["q5_filtered_window_range"] = _q5

    # ---- analytics workload (joins / top-k / semi-join; SURVEY.md §2.4
    # notes the reference has none of these — they're the engine's
    # at-scale surface, and the bench headliners) ----
    from kafkastreamsinteractivequeries_spark.operators import analytics as A

    q["a1_pricing_summary"] = lambda s, d: A.pricing_summary(load_table(s, d, "lineitem"))
    q["a2_revenue_by_nation"] = lambda s, d: A.revenue_by_nation(
        load_table(s, d, "lineitem"),
        load_table(s, d, "orders"),
        load_table(s, d, "customer"),
        load_table(s, d, "nation"),
        load_table(s, d, "region"),
    )
    q["a3_top_customers_by_segment"] = lambda s, d: A.top_customers_by_segment(
        load_table(s, d, "lineitem"),
        load_table(s, d, "orders"),
        load_table(s, d, "customer"),
    )
    q["a4_order_priority_exists"] = lambda s, d: A.order_priority_exists(
        load_table(s, d, "orders"), load_table(s, d, "lineitem")
    )
    q["a5_parts_range_filtered"] = lambda s, d: A.parts_range_filtered(
        load_table(s, d, "part"), "Brand#1", "Brand#3", 10
    )

    return q


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}
    o["t5_stock_aggregation"] = _ORACLE_AGG_CTE + "SELECT * FROM agg"
    o["q1_key_query"] = _ORACLE_AGG_CTE + "SELECT * FROM agg WHERE symbol = 'purchase'"
    o["q2_multikey_query"] = (
        _ORACLE_AGG_CTE
        + "SELECT * FROM agg WHERE symbol IN ('click', 'purchase', 'signup')"
    )
    o["q3_range_query"] = (
        _ORACLE_AGG_CTE + "SELECT * FROM agg WHERE symbol BETWEEN 'click' AND 'signup'"
    )
    o["q3_range_lower_only"] = _ORACLE_AGG_CTE + "SELECT * FROM agg WHERE symbol >= 'error'"
    o["q3_range_upper_only"] = _ORACLE_AGG_CTE + "SELECT * FROM agg WHERE symbol <= 'purchase'"
    o["q6_full_scan"] = _ORACLE_AGG_CTE + "SELECT * FROM agg"
    o["q4_filtered_range"] = (
        _ORACLE_AGG_CTE
        + "SELECT * FROM agg WHERE symbol BETWEEN 'click' AND 'view' AND buys > sells"
    )
    o["q4_filtered_range_symbol"] = _ORACLE_AGG_CTE + "SELECT * FROM agg WHERE symbol = 'purchase'"
    o["q4_filtered_range_numeric"] = (
        _ORACLE_AGG_CTE + "SELECT * FROM agg WHERE buys > 299 AND number_shares > 100"
    )
    _wagg_cte = (
        _ORACLE_AGG_CTE
        + """, wagg AS (
  SELECT date_trunc('hour', event_time) AS window_start,
         date_trunc('hour', event_time) + INTERVAL 1 HOUR AS window_end,
         symbol,
         ROUND(SUM(CASE WHEN buy THEN amount ELSE 0.0 END), 2) AS buys,
         ROUND(SUM(CASE WHEN NOT buy THEN amount ELSE 0.0 END), 2) AS sells,
         CAST(SUM(number_shares) AS BIGINT) AS number_shares
  FROM txns GROUP BY 1, 2, 3
)
"""
    )
    o["q5_windowed_aggregation"] = _wagg_cte + "SELECT * FROM wagg"
    o["q5_filtered_window_range"] = (
        _wagg_cte
        + """SELECT * FROM wagg
WHERE window_start >= TIMESTAMP '2024-01-02 00:00:00'
  AND window_end <= TIMESTAMP '2024-01-05 00:00:00'
  AND buys > sells"""
    )
    o["a1_pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       ROUND(AVG(l_quantity), 4) AS avg_qty,
       ROUND(AVG(l_extendedprice), 4) AS avg_price,
       ROUND(AVG(l_discount), 4) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""
    o["a2_revenue_by_nation"] = """
SELECT r_name, n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""
    o["a3_top_customers_by_segment"] = """
WITH rev AS (
  SELECT c_mktsegment, c_custkey, c_name,
         ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  GROUP BY c_mktsegment, c_custkey, c_name
)
SELECT c_mktsegment, c_custkey, c_name, revenue, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (
      PARTITION BY c_mktsegment ORDER BY revenue DESC, c_custkey
    ) AS INTEGER) AS rank
  FROM rev
) WHERE rank <= 5
"""
    o["a4_order_priority_exists"] = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
)
GROUP BY o_orderpriority
"""
    o["a5_parts_range_filtered"] = """
SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
FROM part
WHERE p_brand BETWEEN 'Brand#1' AND 'Brand#3' AND p_size >= 10
"""
    return o

#!/usr/bin/env python
"""Benchmark harness: runs the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the total wall-clock of all headline queries (one warm-up
of the session excluded via a trivial action first).  Each query is
executed to completion with a count() + a bounded collect so results
materialize but the driver isn't flooded.
"""

from __future__ import annotations

import json
import os
import sys
import time

import __spark_entry__ as entry_mod
from kafkastreamsinteractivequeries_spark.session import get_spark

# Headliners: the reference-surface flagship + windowed layer + the
# join/top-k analytics workload.  Extension operators are appended as
# they land (dedup / similarity / text — see queries() keys).
HEADLINE = [
    "t5_stock_aggregation",
    "q4_filtered_range",
    "q5_windowed_aggregation",
    "q5_filtered_window_range",
    "a1_pricing_summary",
    "a2_revenue_by_nation",
    "a3_top_customers_by_segment",
    "a4_order_priority_exists",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("ksiq-bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = entry_mod.queries()
    names = [n for n in HEADLINE if n in queries]
    # session warm-up (JVM/codegen init) — not charged to any query
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    per_query: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = queries[name](spark, sf_dir)
        n = df.count()
        df.limit(100).collect()
        per_query[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {per_query[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(per_query.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()

"""16× scale stress for the shape-catalog completion operators —
q2/q6/q7/q8/q9/q11/q13/q16/q18/q20 (`analytics.*`, round 6).

Methodology (SCALING.md): replicate the sf0.1 fact/dim tables 16× with
per-key-family shifts (each replica an independent 1× universe; nation/
region stay SHARED dims, so nation-grouped outputs keep their 1× row
count with 16× sums, while key-grained outputs grow 16×).  Run the
exact operator at 1× vs 16× and confirm wall growth stays ≈ linear.

q11's mean-relative threshold is scale-free by design (the global MEAN
per-part revenue is invariant under replication), so no per-scale
adjustment is needed — 16× should return exactly 16× the 1× rows.

Usage: python scripts/stress_shapes.py
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafkastreamsinteractivequeries_spark.operators import analytics as A  # noqa: E402
from kafkastreamsinteractivequeries_spark.session import get_spark  # noqa: E402
from kafkastreamsinteractivequeries_spark.sources.tables import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "shapesx16"
)
REPLICAS = 16

TABLES = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "part": ["p_partkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],  # s_nationkey untouched: nation is shared
}


def build_16x(spark) -> dict[str, str]:
    os.makedirs(SCRATCH, exist_ok=True)
    reps = F.broadcast(
        spark.range(REPLICAS).select(F.col("id").cast("long").alias("_r"))
    )
    fam: dict[str, int] = {}
    for t, keys in TABLES.items():
        df = load_table(spark, SF_DIR, t)
        for k in keys:
            f = k.split("_", 1)[1]
            if f not in fam:
                fam[f] = df.agg(F.max(k)).collect()[0][0] + 1
    out = {}
    for t, keys in TABLES.items():
        path = os.path.join(SCRATCH, f"{t}.parquet")
        out[t] = path
        if os.path.exists(path):
            continue
        df = load_table(spark, SF_DIR, t)
        cols = []
        for c in df.columns:
            if c in keys:
                f = c.split("_", 1)[1]
                cols.append((F.col(c) + F.col("_r") * fam[f]).alias(c))
            else:
                cols.append(F.col(c))
        df.crossJoin(reps).select(*cols).write.mode("overwrite").parquet(path)
    return out


def main() -> None:
    spark = get_spark(app_name="stress-shapes", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("FATAL")
    paths = build_16x(spark)
    nat = load_table(spark, SF_DIR, "nation")
    reg = load_table(spark, SF_DIR, "region")

    def tables(scale: str):
        if scale == "1x":
            return {t: load_table(spark, SF_DIR, t) for t in TABLES}
        return {t: spark.read.parquet(paths[t]) for t in TABLES}

    for scale in ("1x", "16x"):
        tb = tables(scale)
        li, ords, pt, cu, sup = (
            tb["lineitem"], tb["orders"], tb["part"], tb["customer"], tb["supplier"],
        )
        li.count()  # warm the file cache
        for name, fn in [
            ("q6_forecast_revenue", lambda: A.forecast_revenue(li)),
            ("q7_nation_pair_volume", lambda: A.nation_pair_volume(li, ords, cu, sup, nat)),
            ("q8_market_share", lambda: A.market_share(li, ords, cu, sup, nat, reg, pt)),
            ("q9_product_profit", lambda: A.product_profit(li, pt, sup, nat)),
            ("q13_order_distribution", lambda: A.customer_order_distribution(cu, ords)),
            ("q18_large_qty_orders", lambda: A.large_quantity_orders(li, ords)),
            ("q2_min_cost_supplier", lambda: A.min_cost_supplier(li, pt, sup)),
            ("q11_important_parts", lambda: A.important_parts(li)),
            ("q16_supplier_part_counts", lambda: A.supplier_part_counts(li, pt, sup)),
            ("q20_dominant_suppliers", lambda: A.dominant_suppliers(li, pt, sup)),
        ]:
            t0 = time.time()
            n = fn().count()
            print(f"{scale:3s} {name:26s} {time.time() - t0:7.2f}s  rows={n}", flush=True)


if __name__ == "__main__":
    main()

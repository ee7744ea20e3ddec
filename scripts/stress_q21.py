"""16× scale stress for the round-6 TPC-H correlation shapes —
q21 (`analytics.waiting_suppliers`: de-correlated EXISTS/NOT-EXISTS
fanout), q17 (`analytics.small_quantity_revenue`: per-part scalar
subquery), q22 (`analytics.idle_customers`: global scalar + anti-join)
and q15 (`analytics.top_revenue_supplier`: global-max over an
aggregate view).

Methodology (SCALING.md): replicate the sf0.1 lineitem/orders/part/
customer tables 16× with shifted keys, run the exact operator at 1× vs
16×, and confirm wall growth stays ≈ linear (healthy ≤ ~3× on this
32-thread host, since the 1× run underfills the cores).  Replicas are
disjoint key populations, so q21/q17 output cardinality grows exactly
16×; the de-correlated plans never rescan per row, so wall should
track input rows, not output × input.

Usage: python scripts/stress_q21.py
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
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "q21x16"
)
REPLICAS = 16


def build_16x(spark) -> dict[str, str]:
    """lineitem/orders/part/customer replicated 16× with shifted keys.
    Every key column shifts by replica × (max+1) so joins stay within a
    replica — each replica is an independent 1× universe and the
    correct output is exactly 16 disjoint copies of the 1× answer."""
    os.makedirs(SCRATCH, exist_ok=True)
    reps = F.broadcast(
        spark.range(REPLICAS).select(F.col("id").cast("long").alias("_r"))
    )
    shifts: dict[str, dict[str, int]] = {}
    tables = {
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "part": ["p_partkey"],
        "customer": ["c_custkey"],
    }
    # one shared shift per key family so FKs stay consistent
    fam = {}
    for t, keys in tables.items():
        df = load_table(spark, SF_DIR, t)
        for k in keys:
            f = k.split("_", 1)[1]  # orderkey / partkey / suppkey / custkey
            if f not in fam:
                fam[f] = df.agg(F.max(k)).collect()[0][0] + 1
    out = {}
    for t, keys in tables.items():
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
    spark = get_spark(app_name="stress-q21", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("FATAL")
    paths = build_16x(spark)

    def t1x():
        li = load_table(spark, SF_DIR, "lineitem")
        ords = load_table(spark, SF_DIR, "orders")
        pt = load_table(spark, SF_DIR, "part")
        cu = load_table(spark, SF_DIR, "customer")
        return li, ords, pt, cu

    def t16x():
        return tuple(
            spark.read.parquet(paths[t])
            for t in ("lineitem", "orders", "part", "customer")
        )

    def run(tag, tables):
        li, ords, pt, cu = tables
        sup = li.select(F.col("l_suppkey").alias("s_suppkey")).distinct().select(
            "s_suppkey", F.concat(F.lit("S"), F.col("s_suppkey")).alias("s_name")
        )
        for name, fn in [
            ("q21_waiting_suppliers", lambda: A.waiting_suppliers(li, ords)),
            ("q17_small_qty_revenue", lambda: A.small_quantity_revenue(li, pt)),
            (
                "q22_idle_customers",
                lambda: A.idle_customers(cu, ords, min_order_total=400000.0),
            ),
            ("q15_top_supplier", lambda: A.top_revenue_supplier(li, sup)),
        ]:
            t0 = time.time()
            n = fn().count()
            print(f"{tag} {name:24s} {time.time() - t0:7.2f}s  rows={n}")

    # warm the JVM + file cache
    load_table(spark, SF_DIR, "lineitem").count()
    spark.read.parquet(paths["lineitem"]).count()
    run("1x ", t1x())
    run("16x", t16x())


if __name__ == "__main__":
    main()

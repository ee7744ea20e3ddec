"""16× scale stress for the round-5 driver keys e1 (event analytics:
funnel ⊕ cohort ⊕ bucketized interval join) and e2 (SCD2 merge chain +
as-of lookup) — the SCALING.md methodology: replicate the sf0.1 input
tables 16× with shifted ids, run the exact driver-key pipelines at 1×
vs 16×, and confirm wall growth stays ≈ linear in rows (healthy ≤ ~3×
per the repo's historical band on this host) and the plan shape holds
(e2's merge one co-partitioned shuffle join; as-of's 2-row timestamp
table the only nested-loop/broadcast side).

Usage: python scripts/stress_e1_e2.py
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from kafkastreamsinteractivequeries_spark.session import get_spark  # noqa: E402
from kafkastreamsinteractivequeries_spark.sources.tables import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "e16x"
)
REPLICAS = 16


def build_16x(spark) -> None:
    """Events + customer replicated 16× with shifted ids (timestamps
    unchanged so funnel horizons / SCD2 effective dates keep their
    semantics; each replica is a disjoint user/customer population, so
    output cardinality grows linearly by construction)."""
    os.makedirs(SCRATCH, exist_ok=True)
    ev_out = os.path.join(SCRATCH, "events.parquet")
    cu_out = os.path.join(SCRATCH, "customer.parquet")
    reps = F.broadcast(
        spark_range_df(spark)
    )
    if not os.path.exists(ev_out):
        ev = load_table(spark, SF_DIR, "events")
        n_uid = ev.agg(F.max("user_id")).collect()[0][0] + 1
        n_eid = ev.agg(F.max("event_id")).collect()[0][0] + 1
        big = ev.crossJoin(reps).select(
            (F.col("event_id") + F.col("_r") * n_eid).alias("event_id"),
            (F.col("user_id") + F.col("_r") * n_uid).alias("user_id"),
            *[c for c in ev.columns if c not in ("event_id", "user_id")],
        )
        big.write.mode("overwrite").parquet(ev_out)
    if not os.path.exists(cu_out):
        cu = load_table(spark, SF_DIR, "customer")
        n_ck = cu.agg(F.max("c_custkey")).collect()[0][0] + 1
        big = cu.crossJoin(reps).select(
            (F.col("c_custkey") + F.col("_r") * n_ck).alias("c_custkey"),
            *[c for c in cu.columns if c != "c_custkey"],
        )
        big.write.mode("overwrite").parquet(cu_out)


def spark_range_df(spark):
    return spark.range(REPLICAS).withColumnRenamed("id", "_r")


def timed(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    spark = get_spark("stress-e1-e2")
    spark.sparkContext.setLogLevel("ERROR")
    build_16x(spark)
    queries = entry_mod.queries()
    for key in ("e1_event_analytics", "e2_scd2_asof"):
        base = timed(queries[key](spark, SF_DIR))
        rows_1x = queries[key](spark, SF_DIR).count()
        big = timed(queries[key](spark, SCRATCH))
        rows_16x = queries[key](spark, SCRATCH).count()
        print(
            f"{key}: 1x {base:.2f}s ({rows_1x} rows) -> 16x {big:.2f}s "
            f"({rows_16x} rows) = {big / base:.1f}x wall, "
            f"{rows_16x / rows_1x:.1f}x output"
        )


if __name__ == "__main__":
    main()

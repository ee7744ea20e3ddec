"""16× scale stress for the round-6 additions: t5's rollup-merge
branches (hour partials → day merge, HLL register merge) and e3's
compaction planner branch — SCALING.md methodology: replicate the
sf0.1 inputs 16× with shifted ids, run the exact driver-key pipelines
at 1× vs 16×, confirm ≈ linear wall growth.

For the rollup the interesting ratio is the MERGE stage alone: it reads
partials (rows ∝ symbols × hours, NOT events), so its cost should grow
far slower than raw — measured separately below.

Usage: python scripts/stress_rollup_compact.py
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from kafkastreamsinteractivequeries_spark.operators import rollup as R  # noqa: E402
from kafkastreamsinteractivequeries_spark.session import get_spark  # noqa: E402
from kafkastreamsinteractivequeries_spark.sources.tables import (  # noqa: E402
    load_table,
    transactions_from_events,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scratch",
    "rollup16x",
)
REPLICAS = 16
MEASURES = {
    "buy_amt": ["sum"],
    "sell_amt": ["sum"],
    "amount": ["sum"],
    "number_shares": ["sum"],
}


def build_16x(spark) -> None:
    os.makedirs(SCRATCH, exist_ok=True)
    reps = F.broadcast(spark.range(REPLICAS).withColumnRenamed("id", "_r"))
    specs = {
        "events": ("event_id", ["user_id"]),
        "documents": ("doc_id", []),
        "part": ("p_partkey", []),
    }
    for table, (id_col, extra_ids) in specs.items():
        out = os.path.join(SCRATCH, f"{table}.parquet")
        if os.path.exists(out):
            continue
        df = load_table(spark, SF_DIR, table)
        shifts = {}
        for c in [id_col, *extra_ids]:
            shifts[c] = df.agg(F.max(c)).collect()[0][0] + 1
        big = df.crossJoin(reps).select(
            *[
                (F.col(c) + F.col("_r") * shifts[c]).alias(c)
                if c in shifts
                else F.col(c)
                for c in df.columns
            ]
        )
        big.write.mode("overwrite").parquet(out)


def timed(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def txns(spark, d):
    amt = F.col("amount").cast("decimal(18,6)")
    zero = F.lit(0).cast("decimal(18,6)")
    return transactions_from_events(load_table(spark, d, "events")).select(
        "symbol",
        "event_time",
        amt.alias("amount"),
        "number_shares",
        F.when(F.col("buy"), amt).otherwise(zero).alias("buy_amt"),
        F.when(~F.col("buy"), amt).otherwise(zero).alias("sell_amt"),
    )


def main() -> None:
    spark = get_spark("stress-rollup-compact")
    spark.sparkContext.setLogLevel("ERROR")
    build_16x(spark)

    for key in ("t5_stock_aggregation", "e3_layout_keys"):
        fn = entry_mod.queries()[key]
        base, rows_1x = timed(fn(spark, SF_DIR)), fn(spark, SF_DIR).count()
        big, rows_16x = timed(fn(spark, SCRATCH)), fn(spark, SCRATCH).count()
        print(
            f"{key}: 1x {base:.2f}s ({rows_1x} rows) -> 16x {big:.2f}s "
            f"({rows_16x} rows) = {big / base:.1f}x wall"
        )

    # merge stage alone, over LANDED partials: land hour partials from
    # both corpora, then time only merge_partials — the read path a
    # warehouse actually runs per report.
    for tag, d in (("1x", SF_DIR), ("16x", SCRATCH)):
        part_path = os.path.join(SCRATCH, f"partials_{tag}.parquet")
        if not os.path.exists(part_path):
            R.partial_aggregate(
                txns(spark, d), ["symbol"], "event_time", "hour", MEASURES
            ).write.mode("overwrite").parquet(part_path)
        partials = spark.read.parquet(part_path)
        n = partials.count()
        t = timed(R.merge_partials(partials, ["symbol"], grain="day"))
        print(f"merge-from-landed-partials {tag}: {n} partial rows, {t:.2f}s")


if __name__ == "__main__":
    main()

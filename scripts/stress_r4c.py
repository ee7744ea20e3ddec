"""16× scale-stress for the round-4-continuation operators (the rows in
SCALING.md's table marked r4: sketches, bm25, embedding_decontaminate,
interval_join, funnel, cohort).  Methodology identical to
``stress_scale.py``: replicate the sf0.1 inputs 16× with shifted ids,
time 1× vs 16× (min of 3 after a warm-up), expect ~linear growth.

Usage: python scripts/stress_r4c.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafkastreamsinteractivequeries_spark.session import get_spark
from kafkastreamsinteractivequeries_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(fn, label, n=3):
    fn().write.format("noop").mode("overwrite").save()
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best:.3f}s")
    return best


def main() -> None:
    spark = get_spark("stress-r4c")
    spark.sparkContext.setLogLevel("ERROR")
    reps = spark.range(16).withColumnRenamed("id", "_r")

    ev1 = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_type", "ts"
    ).localCheckpoint()
    ev16 = (
        ev1.crossJoin(reps)
        .select(
            (F.col("user_id") + F.col("_r") * 100_000).alias("user_id"),
            "event_type",
            "ts",
        )
        .repartition(32)
        .localCheckpoint()
    )
    docs1 = load_table(spark, SF_DIR, "documents").localCheckpoint()
    nd = docs1.count()
    docs16 = (
        docs1.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("_r") * nd).alias("doc_id"),
            F.when(F.col("_r") == 0, F.col("text"))
            .otherwise(F.concat("text", F.lit(" rep"), "_r"))
            .alias("text"),
        )
        .repartition(32)
        .localCheckpoint()
    )
    emb1 = load_table(spark, SF_DIR, "embeddings").localCheckpoint()
    ne = emb1.count()
    emb16 = (
        emb1.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("_r") * ne).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: (
                    x + (F.col("_r") % 7).cast("float") * 0.001 * ((i % 5) - 2)
                ).cast("float"),
            ).alias("embedding"),
        )
        .repartition(32)
        .localCheckpoint()
    )
    ev16.count(), docs16.count(), emb16.count()

    from kafkastreamsinteractivequeries_spark.operators import sketches as SK
    from kafkastreamsinteractivequeries_spark.operators.analytics import (
        cohort_retention,
        funnel_analysis,
        interval_join,
    )
    from kafkastreamsinteractivequeries_spark.operators.similarity import (
        embedding_decontaminate,
    )
    from kafkastreamsinteractivequeries_spark.operators.text import bm25_search

    for ev, tag in ((ev1, "1x"), (ev16, "16x")):
        timed(lambda: SK.hll_distinct(ev, "user_id", ["event_type"], p=6), f"hll {tag}")
        timed(lambda: SK.kmv_distinct(ev, "user_id", ["event_type"], k=32), f"kmv {tag}")
        timed(lambda: SK.cms_counters(ev, "user_id", depth=4, width=1024), f"cms {tag}")
        timed(
            lambda: funnel_analysis(ev, ["click", "view", "purchase"], horizon_days=30),
            f"funnel {tag}",
        )
        timed(lambda: cohort_retention(ev, period="week"), f"cohort {tag}")
    for docs, tag in ((docs1, "1x"), (docs16, "16x")):
        timed(
            lambda: bm25_search(docs, ["spark", "vector", "hash"], k=10),
            f"bm25 {tag}",
        )
    ev_set = emb1.filter(F.col("vec_id") % 40 == 0).select(
        (F.col("vec_id") + 900_000).alias("eval_id"), "embedding"
    ).localCheckpoint()
    ev_set.count()
    for emb, tag in ((emb1, "1x"), (emb16, "16x")):
        timed(lambda: embedding_decontaminate(emb, ev_set), f"edecon {tag}")

    # interval join: synthetic points × hour-long intervals
    def mk(n_pts, n_ivs):
        pts = spark.range(n_pts).select(
            F.col("id").alias("pid"),
            F.timestamp_seconds(1_700_000_000 + F.col("id") * 7).alias("ts"),
        ).localCheckpoint()
        ivs = spark.range(n_ivs).select(
            F.col("id").alias("iv"),
            F.timestamp_seconds(1_700_000_000 + F.col("id") * 700).alias("start_ts"),
            F.timestamp_seconds(1_700_000_000 + F.col("id") * 700 + 3600).alias("end_ts"),
        ).localCheckpoint()
        pts.count(), ivs.count()
        return pts, ivs

    p1, i1 = mk(500_000, 5_000)
    timed(lambda: interval_join(p1, i1, bucket_seconds=3600), "interval_join 1x")
    p2, i2 = mk(8_000_000, 80_000)
    timed(lambda: interval_join(p2, i2, bucket_seconds=3600), "interval_join 16x")


if __name__ == "__main__":
    main()

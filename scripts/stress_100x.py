"""100x scale-stress for the near-dup / connected-components / curation
chain (d9, s4, d10, p1) — SCALING.md methodology one decade beyond the
16x rows: replicate the sf0.1 extension tables 100x with shifted ids and
perturbed content (500k docs / 200k vectors), time 1x vs 100x, and
report the LSH cap telemetry (``dropped_bucket_stats``) so the
``max_bucket_size`` recall erosion stays observable rather than silent.

Healthy = wall-clock growth ~linear in input rows + output pairs (the
same band the 16x table established); the caps keep the replica-induced
identical-text bucket blowup bounded by construction.

Usage: python scripts/stress_100x.py [d9|s4|d10|p1|all]
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafkastreamsinteractivequeries_spark.session import get_spark  # noqa: E402
from kafkastreamsinteractivequeries_spark.sources.tables import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch"
)
REPLICAS = 100


def build_100x(spark):
    """Materialize 100x replicas with shifted ids + perturbed content —
    same construction as ``stress_scale.build_16x`` (text replicas get a
    per-replica suffix so they are near- but not exact-duplicates;
    embeddings get a tiny deterministic rotation)."""
    emb_out = os.path.join(SCRATCH, "emb100x.parquet")
    doc_out = os.path.join(SCRATCH, "doc100x.parquet")
    if not os.path.exists(emb_out):
        emb = load_table(spark, SF_DIR, "embeddings")
        n = emb.count()
        reps = spark.range(REPLICAS).withColumnRenamed("id", "_r")
        big = emb.crossJoin(reps).select(
            (F.col("vec_id") + F.col("_r") * n).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: (
                    x + (F.col("_r") % 7).cast("float") * 0.001 * ((i % 5) - 2)
                ).cast("float"),
            ).alias("embedding"),
            *[c for c in emb.columns if c not in ("vec_id", "embedding")],
        )
        big.repartition(32).write.mode("overwrite").parquet(emb_out)
    if not os.path.exists(doc_out):
        docs = load_table(spark, SF_DIR, "documents")
        n = docs.count()
        reps = spark.range(REPLICAS).withColumnRenamed("id", "_r")
        big = docs.crossJoin(reps).select(
            (F.col("doc_id") + F.col("_r") * n).alias("doc_id"),
            F.when(F.col("_r") == 0, F.col("text"))
            .otherwise(F.concat(F.col("text"), F.lit(" rep"), F.col("_r")))
            .alias("text"),
            *[c for c in docs.columns if c not in ("doc_id", "text")],
        )
        big.repartition(32).write.mode("overwrite").parquet(doc_out)
    return emb_out, doc_out


def timed(label, fn):
    t0 = time.time()
    n = fn()
    dt = time.time() - t0
    print(f"{label}: {dt:.1f}s ({n} rows)", flush=True)
    return dt


def growth(res):
    print(
        f"  growth: 100x/1x = {res['100x'] / res['1x']:.1f}x "
        f"(data grew {REPLICAS}x)",
        flush=True,
    )


def stress_d9(spark, doc100x):
    from kafkastreamsinteractivequeries_spark.operators.dedup import (
        weighted_near_duplicates,
    )

    doc1 = load_table(spark, SF_DIR, "documents")
    doc100 = spark.read.parquet(doc100x)
    res = {}
    for label, df in (("1x", doc1), ("100x", doc100)):
        res[label] = timed(
            f"d9 {label}", lambda df=df: weighted_near_duplicates(df).count()
        )
    growth(res)


def stress_s4(spark, emb100x):
    from kafkastreamsinteractivequeries_spark.operators.similarity import (
        dropped_bucket_stats,
        embedding_near_duplicates,
    )

    emb1 = load_table(spark, SF_DIR, "embeddings")
    emb100 = spark.read.parquet(emb100x)
    res = {}
    for label, df in (("1x", emb1), ("100x", emb100)):
        out = embedding_near_duplicates(df, threshold=0.4)  # auto band bits
        res[label] = timed(f"s4 {label} (auto planes)", out.count)
        stats = dropped_bucket_stats(out)
        print(
            f"  dropped-bucket fraction: {stats['fraction']:.4f} "
            f"({stats['dropped_rows']}/{stats['total_rows']})",
            flush=True,
        )
    growth(res)


def stress_d10(spark, doc100x):
    from kafkastreamsinteractivequeries_spark.operators.dedup import (
        near_duplicate_groups,
    )

    doc1 = load_table(spark, SF_DIR, "documents")
    doc100 = spark.read.parquet(doc100x)
    res = {}
    for label, df in (("1x", doc1), ("100x", doc100)):
        res[label] = timed(
            f"d10 {label}", lambda df=df: near_duplicate_groups(df).count()
        )
    growth(res)


def stress_p1(spark, doc100x):
    from kafkastreamsinteractivequeries_spark.operators.curation import (
        curate_documents,
    )

    doc1 = load_table(spark, SF_DIR, "documents")
    doc100 = spark.read.parquet(doc100x)
    res = {}
    for label, df in (("1x", doc1), ("100x", doc100)):
        res[label] = timed(
            f"p1 {label}", lambda df=df: curate_documents(df).count()
        )
    growth(res)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark("stress100x")
    spark.sparkContext.setLogLevel("ERROR")
    emb100x, doc100x = build_100x(spark)
    if which in ("d9", "all"):
        stress_d9(spark, doc100x)
    if which in ("s4", "all"):
        stress_s4(spark, emb100x)
    if which in ("d10", "all"):
        stress_d10(spark, doc100x)
    if which in ("p1", "all"):
        stress_p1(spark, doc100x)

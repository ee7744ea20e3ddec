"""16× scale-stress harness (SCALING.md methodology).

Replicates the sf0.1 extension tables 16× with shifted ids and perturbed
content into ``.scratch/``, then times heavy operators at 1× vs 16×.
A healthy operator grows ≈ linearly in rows (+ output size).

Usage: python scripts/stress_scale.py [s4|d10|all]
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
SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch")
REPLICAS = 16


def build_16x(spark):
    """Materialize 16× replicas with shifted ids + perturbed content."""
    emb_out = os.path.join(SCRATCH, "emb16x.parquet")
    doc_out = os.path.join(SCRATCH, "doc16x.parquet")
    if not os.path.exists(emb_out):
        emb = load_table(spark, SF_DIR, "embeddings")
        n = emb.count()
        reps = spark.range(REPLICAS).withColumnRenamed("id", "_r")
        big = (
            emb.crossJoin(reps)
            .select(
                (F.col("vec_id") + F.col("_r") * n).alias("vec_id"),
                # perturb: tiny deterministic per-replica rotation keeps
                # replicas near- but not exact-duplicates
                F.transform(
                    "embedding", lambda x, i: (x + (F.col("_r") % 7).cast("float") * 0.001 * ((i % 5) - 2)).cast("float")
                ).alias("embedding"),
                *[c for c in emb.columns if c not in ("vec_id", "embedding")],
            )
        )
        big.write.mode("overwrite").parquet(emb_out)
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
        big.write.mode("overwrite").parquet(doc_out)
    return emb_out, doc_out


def timed(label, fn):
    t0 = time.time()
    n = fn()
    dt = time.time() - t0
    print(f"{label}: {dt:.1f}s ({n} rows)")
    return dt


def stress_s4(spark, emb16x):
    from kafkastreamsinteractivequeries_spark.operators.similarity import (
        dropped_bucket_stats,
        embedding_near_duplicates,
        knn_bruteforce,
    )

    emb1 = load_table(spark, SF_DIR, "embeddings")
    emb16 = spark.read.parquet(emb16x)

    res = {}
    for label, df in (("1x", emb1), ("16x", emb16)):
        out = embedding_near_duplicates(df, threshold=0.4)  # auto band bits
        res[label] = timed(f"s4 {label} (auto planes)", out.count)
        stats = dropped_bucket_stats(out)
        print(f"  dropped-bucket fraction: {stats['fraction']:.4f} ({stats['dropped_rows']}/{stats['total_rows']})")
    print(f"s4 growth at {REPLICAS}x corpus: {res['16x'] / res['1x']:.1f}x")

    # recall audit vs exact bruteforce on a 20-query sample (16x corpus)
    queries = emb16.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {
        (r.query_id, r.vec_id)
        for r in knn_bruteforce(emb16, queries, k=10).collect()
        if r.cosine >= 0.4
    }
    pairs = embedding_near_duplicates(emb16, threshold=0.4)
    got = {
        (a, b)
        for r in pairs.filter((F.col("id_a") < 20) | (F.col("id_b") < 20)).collect()
        for a, b in ((r.id_a, r.id_b), (r.id_b, r.id_a))
    }
    hit = sum(1 for p in exact if p in got)
    print(f"s4 recall vs bruteforce@0.4 (20-query sample): {hit}/{len(exact)}"
          f" = {hit / max(1, len(exact)):.2f}")


def stress_d9(spark, doc16x):
    from kafkastreamsinteractivequeries_spark.operators.dedup import (
        weighted_near_duplicates,
    )

    doc1 = load_table(spark, SF_DIR, "documents")
    doc16 = spark.read.parquet(doc16x)
    res = {}
    for label, df in (("1x", doc1), ("16x", doc16)):
        res[label] = timed(
            f"d9 {label}", lambda df=df: weighted_near_duplicates(df).count()
        )
    print(f"d9 growth at {REPLICAS}x corpus: {res['16x'] / res['1x']:.1f}x")


def stress_p1(spark, doc16x):
    from kafkastreamsinteractivequeries_spark.operators.curation import (
        curate_documents,
    )

    doc1 = load_table(spark, SF_DIR, "documents")
    doc16 = spark.read.parquet(doc16x)
    res = {}
    for label, df in (("1x", doc1), ("16x", doc16)):
        res[label] = timed(
            f"p1 {label}", lambda df=df: curate_documents(df).count()
        )
    print(f"p1 growth at {REPLICAS}x corpus: {res['16x'] / res['1x']:.1f}x")


def stress_d8(spark, doc16x):
    from kafkastreamsinteractivequeries_spark.operators.dedup import (
        simhash_near_duplicates,
    )

    doc1 = load_table(spark, SF_DIR, "documents")
    doc16 = spark.read.parquet(doc16x)
    res = {}
    for label, df in (("1x", doc1), ("16x", doc16)):
        res[label] = timed(
            f"d8 {label}", lambda df=df: simhash_near_duplicates(df).count()
        )
    print(f"d8 growth at {REPLICAS}x corpus: {res['16x'] / res['1x']:.1f}x")


def stress_d10(spark, doc16x):
    from kafkastreamsinteractivequeries_spark.operators.dedup import (
        minhash_near_duplicates,
        near_duplicate_groups,
    )

    doc1 = load_table(spark, SF_DIR, "documents")
    doc16 = spark.read.parquet(doc16x)
    res = {}
    for label, df in (("1x", doc1), ("16x", doc16)):
        res[label] = timed(f"d10 {label}", lambda df=df: near_duplicate_groups(df).count())
    print(f"d10 growth at {REPLICAS}x corpus: {res['16x'] / res['1x']:.1f}x")


def stress_x12(spark, doc16x):
    from kafkastreamsinteractivequeries_spark.operators.text import pii_stats

    doc1 = load_table(spark, SF_DIR, "documents")
    doc16 = spark.read.parquet(doc16x)
    res = {}
    for label, df in (("1x", doc1), ("16x", doc16)):
        res[label] = timed(f"x12 {label}", lambda df=df: pii_stats(df).count())
    print(f"x12 growth at {REPLICAS}x corpus: {res['16x'] / res['1x']:.1f}x")


def stress_x13(spark, doc16x):
    from kafkastreamsinteractivequeries_spark.operators.text import ngram_decontaminate

    doc1 = load_table(spark, SF_DIR, "documents")
    doc16 = spark.read.parquet(doc16x)
    res = {}
    for label, df in (("1x", doc1), ("16x", doc16)):
        res[label] = timed(
            f"x13 {label}",
            lambda df=df: ngram_decontaminate(
                df.filter(F.col("doc_id") % 20 != 0),
                df.filter(F.col("doc_id") % 20 == 0),
                n=3,
            ).count(),
        )
    print(f"x13 growth at {REPLICAS}x corpus: {res['16x'] / res['1x']:.1f}x")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark("stress")
    spark.sparkContext.setLogLevel("ERROR")
    emb16x, doc16x = build_16x(spark)
    if which in ("s4", "all"):
        stress_s4(spark, emb16x)
    if which in ("d8", "all"):
        stress_d8(spark, doc16x)
    if which in ("d9", "all"):
        stress_d9(spark, doc16x)
    if which in ("p1", "all"):
        stress_p1(spark, doc16x)
    if which in ("d10", "all"):
        stress_d10(spark, doc16x)
    if which in ("x12", "all"):
        stress_x12(spark, doc16x)
    if which in ("x13", "all"):
        stress_x13(spark, doc16x)

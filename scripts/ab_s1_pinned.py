"""A/B: does pinning one shared spread+localCheckpoint of embeddings
across the four s1 kNN branches (and s2's three index builds) reduce
wall-clock at sf0.1?  Run on an idle host after bench.py.

Usage: python scripts/ab_s1_pinned.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

import __spark_entry__ as E
from kafkastreamsinteractivequeries_spark.session import get_spark
from kafkastreamsinteractivequeries_spark.operators import similarity as S
from kafkastreamsinteractivequeries_spark.sources.tables import load_table, spread

SF = "/root/testdata/sf0.1"


def run(df_fn, label, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        df_fn().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best:.3f}s")
    return best


def main():
    spark = get_spark("ab-s1")
    spark.sparkContext.setLogLevel("ERROR")
    q = E.queries()

    # warm-up
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    q["s1_knn"](spark, SF).write.format("noop").mode("overwrite").save()

    run(lambda: q["s1_knn"](spark, SF), "s1 current")
    run(lambda: q["s2_index_assignments"](spark, SF), "s2 current")

    emb_raw = load_table(spark, SF, "embeddings")
    qdf = (
        emb_raw.filter(F.col("vec_id") < 5)
        .select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        )
    )

    def s1_pinned():
        emb = spread(emb_raw).localCheckpoint(eager=False)

        def tag(df, t, score_col):
            return df.select(
                F.lit(t).alias("variant"),
                "query_id",
                "vec_id",
                F.col(score_col).alias("score"),
                "rank",
            )

        brute = tag(S.knn_bruteforce(emb, qdf, k=10), "brute", "cosine")
        srp = tag(S.knn_srp(emb, qdf, k=10, num_planes=16, chunks=4), "srp16", "cosine")
        ivf = tag(S.knn_ivf(emb, qdf, k=10, n_lists=16, nprobe=4), "ivf16", "cosine")
        book = S.pq_train(emb, m=8, k=16, iterations=2)
        pq = tag(S.knn_pq_adc(emb, qdf, book, k=10, m=8), "pq8x16", "adc_dist")
        return brute.unionByName(srp).unionByName(ivf).unionByName(pq)

    # warm + timed
    s1_pinned().write.format("noop").mode("overwrite").save()
    run(s1_pinned, "s1 pinned-emb")

    def s2_pinned():
        emb = spread(emb_raw).localCheckpoint(eager=False)
        srp = S.srp_codes(emb).select(
            "vec_id", F.lit("srp16").alias("index_kind"), F.col("code")
        )
        ivf = S.ivf_assign(emb, n_lists=16).select(
            "vec_id",
            F.lit("ivf16").alias("index_kind"),
            F.col("list_id").cast("string").alias("code"),
        )
        ivft = S.ivf_assign(
            emb, n_lists=16, centroids=S.ivf_train(emb, n_lists=16, iterations=2)
        ).select(
            "vec_id",
            F.lit("ivf16t").alias("index_kind"),
            F.col("list_id").cast("string").alias("code"),
        )
        return srp.unionByName(ivf).unionByName(ivft)

    s2_pinned().write.format("noop").mode("overwrite").save()
    run(s2_pinned, "s2 pinned-emb")


if __name__ == "__main__":
    main()

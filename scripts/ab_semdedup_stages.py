#!/usr/bin/env python
"""Break semdedup's ~7 s into: assignment, pair-verify, components,
final window."""
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F

from kafkastreamsinteractivequeries_spark.session import get_spark
from kafkastreamsinteractivequeries_spark.operators import similarity as S
from kafkastreamsinteractivequeries_spark.operators.similarity import (
    ivf_centroids,
    _ivf_argmax,
    norm_expr,
    cosine_from_parts,
)
from kafkastreamsinteractivequeries_spark.operators.dedup import (
    bucket_self_join_pairs,
    connected_components_star,
)
from kafkastreamsinteractivequeries_spark.sources.tables import spread

SF = "/root/testdata/sf0.1"
REPS = 3


def main():
    s = get_spark("ab-semdedup")
    s.range(10).count()
    emb = s.read.parquet(f"{SF}/embeddings.parquet").select("vec_id", "embedding")

    def stage(name, fn):
        ts, n = [], None
        for _ in range(REPS):
            t0 = time.perf_counter()
            n = fn()
            ts.append(time.perf_counter() - t0)
        print(f"{name:<12} min={min(ts):.2f}s all={[round(t,2) for t in ts]} rows={n}", flush=True)

    cent = ivf_centroids(emb, 16)
    corpus = spread(emb).select("vec_id", "embedding", norm_expr(F.col("embedding")).alias("_na"))

    def asg_fn():
        return _ivf_argmax(corpus, cent, "vec_id", "embedding", carry_cos=True).count()

    stage("assign", asg_fn)

    asg = _ivf_argmax(corpus, cent, "vec_id", "embedding", carry_cos=True).localCheckpoint(eager=True)

    def pairs_df():
        cand = bucket_self_join_pairs(asg.select("vec_id", "list_id"), ["list_id"], "vec_id", 4096)
        ea = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("vec_a"), norm_expr(F.col("embedding")).alias("_pa"))
        eb = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vec_b"), norm_expr(F.col("embedding")).alias("_pb"))
        cos = F.round(cosine_from_parts(F.col("vec_a"), F.col("vec_b"), F.col("_pa"), F.col("_pb")), 6)
        return (
            cand.join(ea.hint("shuffle_hash"), "id_a")
            .join(eb.hint("shuffle_hash"), "id_b")
            .withColumn("_cos", cos)
            .filter(F.col("_cos").isNotNull() & (F.col("_cos") >= 0.3))
            .select("id_a", "id_b")
        )

    stage("pairs_verify", lambda: pairs_df().count())
    pairs = pairs_df().localCheckpoint(eager=True)
    stage("components", lambda: connected_components_star(pairs).count())
    comp = connected_components_star(pairs).localCheckpoint(eager=True)

    def final_fn():
        from pyspark.sql import Window
        members = comp.select(F.col("doc_id").alias("vec_id"), "group_id").join(asg.hint("shuffle_hash"), "vec_id")
        w = Window.partitionBy("group_id").orderBy(F.col("centroid_cosine").asc(), F.col("vec_id"))
        return members.select("vec_id", "list_id", "group_id", "centroid_cosine", (F.row_number().over(w) == 1).alias("keep")).count()

    stage("final_window", final_fn)


if __name__ == "__main__":
    main()

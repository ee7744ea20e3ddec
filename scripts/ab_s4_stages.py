#!/usr/bin/env python
"""Profile s4's branches at sf0.1: self near-dup, bipartite decon,
semdedup (shared pin).  Where do its ~10 bench seconds go?"""
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F

from kafkastreamsinteractivequeries_spark.session import get_spark
from kafkastreamsinteractivequeries_spark.operators import similarity as S

SF = "/root/testdata/sf0.1"
REPS = 3


def main():
    s = get_spark("ab-s4")
    s.range(10).count()
    emb = s.read.parquet(f"{SF}/embeddings.parquet").select("vec_id", "embedding")

    def stage(name, fn):
        ts, n = [], None
        for _ in range(REPS):
            t0 = time.perf_counter()
            n = fn()
            ts.append(time.perf_counter() - t0)
        print(f"{name:<12} min={min(ts):.2f}s all={[round(t,2) for t in ts]} rows={n}", flush=True)

    train = emb.filter(F.col("vec_id") % 20 != 0)
    evals = emb.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("eval_id"), "embedding"
    )

    stage("self", lambda: S.embedding_near_duplicates(
        emb, threshold=0.4, num_planes=32).count())
    stage("decon", lambda: S.embedding_decontaminate(
        train, evals, threshold=0.3, num_planes=32).count())
    stage("semdedup", lambda: S.semdedup(emb, n_lists=16, threshold=0.3).count())


if __name__ == "__main__":
    main()

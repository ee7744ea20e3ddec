#!/usr/bin/env python
"""Profile the x13 'fuzzy' branch (cross_corpus_near_duplicates) stage
by stage at sf0.1: signatures, banding, candidates, prune, verify —
where do its ~5 bench seconds actually go?"""
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F

from kafkastreamsinteractivequeries_spark.session import get_spark
from kafkastreamsinteractivequeries_spark.operators import dedup as D
from kafkastreamsinteractivequeries_spark.operators.dedup import (
    minhash_signatures,
    lsh_band_buckets,
)

SF = "/root/testdata/sf0.1"
REPS = 3


def main():
    s = get_spark("ab-x13-fuzzy")
    s.range(10).count()
    d = s.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    train = d.filter(F.col("doc_id") % 20 != 0)
    evald = d.filter(F.col("doc_id") % 20 == 0).select(
        F.col("doc_id").alias("eval_id"), "text"
    )

    def stage(name, fn):
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            n = fn()
            ts.append(time.perf_counter() - t0)
        print(f"{name:<28} min={min(ts):.2f}s all={[round(t,2) for t in ts]} rows={n}", flush=True)

    stage("full_fuzzy", lambda: D.cross_corpus_near_duplicates(
        train, evald, threshold=0.5).count())
    stage("t_sigs", lambda: minhash_signatures(train, "text", "doc_id", 16, 1).count())
    stage("e_sigs", lambda: minhash_signatures(evald, "text", "eval_id", 16, 1).count())

    def cand_count():
        t_sigs = minhash_signatures(train, "text", "doc_id", 16, 1)
        e_sigs = minhash_signatures(evald, "text", "eval_id", 16, 1)
        tb = lsh_band_buckets(t_sigs, 2, 8, "doc_id")
        eb = lsh_band_buckets(e_sigs, 2, 8, "eval_id")
        return (
            tb.join(F.broadcast(eb), ["band_id", "band_hash"])
            .select("doc_id", "eval_id")
            .distinct()
            .count()
        )

    stage("candidates", cand_count)

    # the pinned-token form the driver key actually runs, stage by stage
    from kafkastreamsinteractivequeries_spark.operators.dedup import (
        token_counts,
        tokens_col,
    )
    from kafkastreamsinteractivequeries_spark.sources.tables import spread

    train_toks = (
        spread(train.withColumnRenamed("eval_id", "doc_id") if "eval_id" in train.columns else train)
        .select("doc_id", tokens_col(F.col("text")).alias("tokens"))
        .localCheckpoint(eager=False)
    )
    train_toks.count()  # materialize the pin outside the timings

    stage("full_fuzzy_pinned", lambda: D.cross_corpus_near_duplicates(
        train, evald, threshold=0.5, train_tokens=train_toks).count())
    stage("t_sigs_pinned", lambda: minhash_signatures(
        train, "text", "doc_id", 16, 1, tokens_df=train_toks).count())
    stage("t_buckets_pinned", lambda: lsh_band_buckets(minhash_signatures(
        train, "text", "doc_id", 16, 1, tokens_df=train_toks), 2, 8, "doc_id").count())
    stage("e_tf", lambda: token_counts(evald, "text", "eval_id").groupBy("eval_id").agg(
        F.map_from_entries(F.collect_list(F.struct("tok", "cnt"))).alias("tf"),
        F.sum("cnt").alias("total")).count())


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""A/B: does sharing ONE pinned tokenized-array scan across all three
x13 branches (exact grams, Bloom grams, fuzzy MinHash) beat the round-7
shape where the gram stream is shared but cross_corpus_near_duplicates
re-tokenizes the 95% train corpus for signatures/totals/tf-maps?

Interleaved min-of-N on the full x13 union at sf0.1."""
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F

from kafkastreamsinteractivequeries_spark.session import get_spark
from kafkastreamsinteractivequeries_spark.operators import dedup as D, text as T
from kafkastreamsinteractivequeries_spark.operators.dedup import tokens_col
from kafkastreamsinteractivequeries_spark.sources.tables import spread

SF = "/root/testdata/sf0.1"
REPS = 4


def docs(s):
    return s.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")


def union(train, evald, grams, train_tokens):
    exact = T.ngram_decontaminate(train, evald, n=3, train_grams=grams).select(
        F.lit("exact").alias("variant"), "doc_id",
        F.lit(-1).cast("long").alias("partner"),
        F.col("n_contaminated_ngrams").cast("double").alias("score"),
        "contaminated",
    )
    words = T.bloom_filter_grams(evald, n=3, num_bits=1 << 20, num_hashes=4)
    bloom = T.ngram_decontaminate_bloom(
        train, words, n=3, num_bits=1 << 20, num_hashes=4, train_grams=grams
    ).select(
        F.lit("bloom").alias("variant"), "doc_id",
        F.lit(-1).cast("long").alias("partner"),
        F.col("n_contaminated_ngrams").cast("double").alias("score"),
        "contaminated",
    )
    fuzzy = D.cross_corpus_near_duplicates(
        train,
        evald.select(F.col("doc_id").alias("eval_id"), "text"),
        threshold=0.5,
        train_tokens=train_tokens,
    ).select(
        F.lit("fuzzy").alias("variant"), "doc_id",
        F.col("eval_id").cast("long").alias("partner"),
        F.col("mjaccard").alias("score"),
        F.lit(True).alias("contaminated"),
    )
    return exact.unionByName(bloom).unionByName(fuzzy)


def run_r7(s):
    """round-7 shape: shared pinned GRAM stream, fuzzy re-tokenizes."""
    d = docs(s)
    train = d.filter(F.col("doc_id") % 20 != 0)
    evald = d.filter(F.col("doc_id") % 20 == 0)
    grams = T.decontamination_gram_rows(train, n=3).localCheckpoint(eager=False)
    return union(train, evald, grams, None).count()


def run_r8(s):
    """round-8 shape: shared pinned TOKEN scan feeds grams AND fuzzy."""
    d = docs(s)
    train = d.filter(F.col("doc_id") % 20 != 0)
    evald = d.filter(F.col("doc_id") % 20 == 0)
    toks = (
        spread(train)
        .select("doc_id", tokens_col(F.col("text")).alias("tokens"))
        .localCheckpoint(eager=False)
    )
    grams = T.decontamination_gram_rows(train, n=3, tokens_df=toks).localCheckpoint(
        eager=False
    )
    return union(train, evald, grams, toks).count()


def main():
    s = get_spark("ab-x13-sharedtok")
    s.range(10).count()
    times = {"r7_sharedgrams": [], "r8_sharedtokens": []}
    for rep in range(REPS):
        for name, fn in (("r7_sharedgrams", run_r7), ("r8_sharedtokens", run_r8)):
            t0 = time.perf_counter()
            n = fn(s)
            dt = time.perf_counter() - t0
            times[name].append(dt)
            print(f"rep{rep} {name:<16} {dt:6.2f}s rows={n}", flush=True)
    for name, ts in times.items():
        print(f"{name:<16} min={min(ts):.2f}s all={[round(t, 2) for t in ts]}")


if __name__ == "__main__":
    main()

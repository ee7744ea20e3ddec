#!/usr/bin/env python
"""A/B: does pinning the train gram-hash stream once and feeding both
the exact and Bloom decontamination branches beat recomputing it per
branch?  Interleaved min-of-N on the full x13 union shape at sf0.1.

Hypothesis: exact + bloom each run `_gram_hash_rows(spread(train))`
(tokenize + md5 every 3-gram window of the whole train corpus).  A
localCheckpoint of the skinny (doc_id, gram) stream costs one write but
replaces the second tokenize+gram pass with a cached-table read — and
at 100 TB it is the difference between scanning the corpus twice or
once for the exact⊕bloom pair.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F

from kafkastreamsinteractivequeries_spark.session import get_spark
from kafkastreamsinteractivequeries_spark.operators import text as T
from kafkastreamsinteractivequeries_spark.operators.text import _gram_hash_rows
from kafkastreamsinteractivequeries_spark.sources.tables import spread

SF = "/root/testdata/sf0.1"
REPS = 4


def docs(s):
    return s.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")


def run_current(s):
    d = docs(s)
    train = d.filter(F.col("doc_id") % 20 != 0)
    evald = d.filter(F.col("doc_id") % 20 == 0)
    exact = T.ngram_decontaminate(train, evald, n=3)
    words = T.bloom_filter_grams(evald, n=3, num_bits=1 << 20, num_hashes=4)
    bloom = T.ngram_decontaminate_bloom(
        train, words, n=3, num_bits=1 << 20, num_hashes=4
    )
    return exact.count() + bloom.count()


def run_shared(s):
    d = docs(s)
    train = d.filter(F.col("doc_id") % 20 != 0)
    evald = d.filter(F.col("doc_id") % 20 == 0)
    tg = _gram_hash_rows(spread(train), 3, "text", "doc_id").localCheckpoint(
        eager=False
    )
    eg = _gram_hash_rows(evald, 3, "text", None).localCheckpoint(eager=False)

    # exact branch off the pinned streams
    hits = (
        tg.join(F.broadcast(eg.distinct()), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").cast("int").alias("n_contaminated_ngrams"))
    )
    exact = (
        train.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_contaminated_ngrams", F.lit(0)).alias("n"),
        )
    )
    # bloom build off the pinned eval stream
    pos = eg.select(
        F.explode(T._bloom_positions(F.col("gram"), 1 << 20, 4)).alias("pos")
    )
    words = (
        pos.select(
            (F.col("pos") / 64).cast("int").alias("word_idx"),
            F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )
    # bloom probe off the pinned train stream
    probes = tg.select(
        F.col("doc_id"),
        F.col("gram"),
        F.posexplode(T._bloom_positions(F.col("gram"), 1 << 20, 4)).alias(
            "_k", "pos"
        ),
    ).select(
        "doc_id",
        "gram",
        (F.col("pos") / 64).cast("int").alias("word_idx"),
        F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("bit"),
    )
    hit = (
        probes.join(F.broadcast(words), "word_idx", "left")
        .select(
            "doc_id",
            "gram",
            (
                F.coalesce(F.col("word"), F.lit(0)).bitwiseAND(F.col("bit"))
                != 0
            ).alias("_set"),
        )
        .groupBy("doc_id", "gram")
        .agg(F.min(F.col("_set").cast("int")).alias("_all_set"))
        .filter(F.col("_all_set") == 1)
        .groupBy("doc_id")
        .agg(F.count("*").cast("int").alias("nc"))
    )
    bloom = (
        train.select("doc_id")
        .join(hit, "doc_id", "left")
        .select("doc_id", F.coalesce("nc", F.lit(0)).alias("n"))
    )
    return exact.count() + bloom.count()


def main():
    s = get_spark("ab-x13")
    s.range(10).count()  # warm
    times = {"current": [], "shared": []}
    for _ in range(REPS):
        for name, fn in (("current", run_current), ("shared", run_shared)):
            t0 = time.perf_counter()
            n = fn(s)
            times[name].append(time.perf_counter() - t0)
            print(f"{name}: {times[name][-1]:.2f}s rows={n}", flush=True)
    for name, ts in times.items():
        print(f"MIN {name}: {min(ts):.3f}s  all={[round(t,2) for t in ts]}")


if __name__ == "__main__":
    main()

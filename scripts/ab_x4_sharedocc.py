#!/usr/bin/env python
"""A/B: pin duplicate_span_occurrences once and derive dupspan/dupfrac/
trimmed off the pinned table vs recomputing the occurrence pipeline
(tokenize + gram + corpus-wide gram-count window) per branch."""
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F
from pyspark.sql import Window

from kafkastreamsinteractivequeries_spark.session import get_spark
from kafkastreamsinteractivequeries_spark.operators import dedup as DD
from kafkastreamsinteractivequeries_spark.operators.dedup import (
    duplicate_span_occurrences,
    tokens_col,
)

SF = "/root/testdata/sf0.1"
REPS = 4


def stats_from_occ(occ, docs):
    by_pos = Window.partitionBy("doc_id").orderBy("pos")
    prev_max_end = F.max("end_pos").over(by_pos.rowsBetween(Window.unboundedPreceding, -1))
    spans = occ.withColumn(
        "is_start",
        F.when(F.col("pos") > F.coalesce(prev_max_end, F.lit(-1)), 1).otherwise(0),
    ).withColumn(
        "island", F.sum("is_start").over(by_pos.rowsBetween(Window.unboundedPreceding, 0))
    )
    per_island = spans.groupBy("doc_id", "island").agg(
        F.count("*").alias("n_grams"),
        (F.max("end_pos") - F.min("pos")).alias("span_tokens"),
        F.first("n_toks").alias("n_toks"),
    )
    return per_island.groupBy("doc_id").agg(
        F.sum("n_grams").alias("n_dup_grams"),
        F.count("*").alias("n_spans"),
        F.sum("span_tokens").alias("dup_tokens"),
        F.round(F.sum("span_tokens") / F.first("n_toks").cast("double"), 6).alias("dup_token_fraction"),
    )


def trimmed_from_occ(occ, docs):
    by_pos = Window.partitionBy("doc_id").orderBy("pos")
    prev_max_end = F.max("end_pos").over(by_pos.rowsBetween(Window.unboundedPreceding, -1))
    spans = (
        occ.withColumn(
            "is_start",
            F.when(F.col("pos") > F.coalesce(prev_max_end, F.lit(-1)), 1).otherwise(0),
        )
        .withColumn("island", F.sum("is_start").over(by_pos.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("doc_id", "island")
        .agg(F.min("pos").alias("s"), F.max("end_pos").alias("e"))
        .groupBy("doc_id")
        .agg(F.collect_list(F.struct("s", "e")).alias("spans"))
    )
    toks = tokens_col(F.col("text"))
    with_spans = docs.join(spans, "doc_id", "left").select(
        "doc_id",
        toks.alias("toks"),
        F.coalesce(F.col("spans"), F.array().cast("array<struct<s:int,e:int>>")).alias("spans"),
    )
    kept = F.filter(
        F.col("toks"),
        lambda tok, i: ~F.exists(F.col("spans"), lambda sp: (i + 1 >= sp["s"]) & (i + 1 < sp["e"])),
    )
    return with_spans.select(
        "doc_id",
        F.array_join(kept, " ").alias("trimmed_text"),
        (F.size("toks") - F.size(kept)).alias("removed_tokens"),
    )


def run_current(docs):
    n = DD.duplicate_span_occurrences(docs, k=8).count()
    n += DD.duplicate_span_stats(docs, k=8).count()
    n += DD.remove_duplicate_spans(docs, k=8).count()
    return n


def run_shared(docs):
    occ = duplicate_span_occurrences(docs, k=8).localCheckpoint(eager=False)
    n = occ.count()
    n += stats_from_occ(occ, docs).count()
    n += trimmed_from_occ(occ, docs).count()
    return n


def main():
    s = get_spark("ab-x4")
    s.range(10).count()
    docs = s.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    times = {"current": [], "shared": []}
    for _ in range(REPS):
        for name, fn in (("current", run_current), ("shared", run_shared)):
            t0 = time.perf_counter()
            n = fn(docs)
            times[name].append(time.perf_counter() - t0)
            print(f"{name}: {times[name][-1]:.2f}s rows={n}", flush=True)
    for name, ts in times.items():
        print(f"MIN {name}: {min(ts):.3f}s  all={[round(t,2) for t in ts]}")


if __name__ == "__main__":
    main()

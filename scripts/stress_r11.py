#!/usr/bin/env python
"""Round-11 stress batch: 16x wall ratios for the code-corpus curation
family and the one-pass quality-signals export, plus the Hamming
integer-space A/B (bit_count over packed pieces vs the r9 64-element
array fold) on the simhash near-dup verify.

Expected shapes: the code family is pure regexp_replace Column chains
(map-only, near-linear); clone grouping is one skinny fingerprint
shuffle; the near-miss tier is the capped-bucket LSH path; the signals
export is one scan-stage pass.  The Hamming A/B compares two value-
identical expressions over the SAME candidate set."""
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F

from kafkastreamsinteractivequeries_spark.operators import code as C
from kafkastreamsinteractivequeries_spark.operators import text as T
from kafkastreamsinteractivequeries_spark.operators.dedup import (
    hamming_distance_bits,
    simhash_signatures,
)
from kafkastreamsinteractivequeries_spark.session import get_spark
from kafkastreamsinteractivequeries_spark.sources.tables import load_table

SF = "/root/testdata/sf0.1"
REPS = 3


def scale(df, factor, id_col="doc_id"):
    if factor == 1:
        return df
    parts = [
        df.select(
            (F.col(id_col) + F.lit(i * 10_000_000)).alias(id_col),
            *[c for c in df.columns if c != id_col],
        )
        for i in range(factor)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def timed(fn):
    best = None
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def hamming_fold(a, b):
    """The pre-r11 expression: two 64-element array allocations per
    candidate pair (kept here only as the A/B baseline)."""
    return F.size(
        F.filter(
            F.zip_with(F.split(a, ""), F.split(b, ""), lambda x, y: x != y),
            lambda d: d,
        )
    )


def main():
    spark = get_spark("stress-r11")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    docs = load_table(spark, SF, "documents")

    # the x4 salted code fixture, rebuilt here at stress scale
    idc = F.col("doc_id")
    a_s = (idc % 7).cast("string")
    n_s = (idc % 100).cast("string")
    t0_ = F.concat(F.lit("def f"), a_s, F.lit("(x):\n    y"), a_s,
                   F.lit(" = "), n_s, F.lit(" # seed\n    return y"),
                   a_s, F.lit(" + x\n"))
    t1_ = F.concat(F.lit("def g"), a_s, F.lit("(x):\n    if x > "), n_s,
                   F.lit(":\n        return x\n    return "), n_s, F.lit("\n"))
    t2_ = F.concat(F.lit("def h"), a_s, F.lit("(s):\n    t"), a_s,
                   F.lit(' = "lit // '), a_s, F.lit('"\n    return t'),
                   a_s, F.lit("\n"))

    def tpl(s):
        return F.when(s == 0, t0_).when(s == 1, t1_).otherwise(t2_)

    hdr = (
        F.when(idc % 5 == 0, "// SPDX-License-Identifier: MIT\n")
        .when(idc % 5 == 1, "# SPDX-License-Identifier: Apache-2.0\n")
        .when(idc % 5 == 2,
              "/* Permission is hereby granted,\n free of charge */\n")
        .when(idc % 5 == 3, "// (c) 2026 Example Corp\n")
        .otherwise("")
    )
    extras = F.repeat(F.lit("    return 0\n"),
                      (F.expr("doc_id div 7") % 3).cast("int"))

    for factor in (1, 16):
        d = scale(docs, factor)
        cfx = d.select(
            "doc_id",
            F.concat(hdr, tpl(idc % 3), extras,
                     tpl(F.expr("doc_id div 3") % 3)).alias("text"),
        )
        print(
            f"spdx+strip+norm x{factor}: "
            f"{timed(lambda: noop(C.spdx_license_headers(cfx).join(C.strip_code_comments(cfx), 'doc_id').withColumn('nrm', C.normalized_code_col(F.col('stripped_text'))))):.2f}s",
            flush=True,
        )
        chunks = C.function_chunks(cfx).select(
            (F.col("doc_id") * 10 + F.col("fn_idx")).alias("cid"), "chunk"
        ).localCheckpoint(eager=False)
        print(
            f"code_clone_groups x{factor}: "
            f"{timed(lambda: noop(C.code_clone_groups(chunks, text_col='chunk', id_col='cid'))):.2f}s",
            flush=True,
        )
        near_src = chunks.filter(F.expr("(cid div 10) % 20 = 0"))
        print(
            f"code_clone_near x{factor}: "
            f"{timed(lambda: noop(C.code_clone_near_duplicates(near_src, text_col='chunk', id_col='cid'))):.2f}s",
            flush=True,
        )
        print(
            f"quality_signal_export x{factor}: "
            f"{timed(lambda: noop(T.quality_signal_export(d, ['dup', 'legacy']))):.2f}s",
            flush=True,
        )

    # Hamming A/B: same candidate set (all pairs of the first 3000
    # simhash signatures against themselves via a band-free crossJoin
    # slice — bounded, deterministic), two value-identical expressions
    sigs = (
        simhash_signatures(docs)
        .filter(F.col("doc_id") < 3000)
        .localCheckpoint(eager=False)
    )
    cand = (
        sigs.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("sa"))
        .join(
            sigs.select(
                F.col("doc_id").alias("id_b"), F.col("simhash").alias("sb")
            ).hint("shuffle_hash"),
            F.col("id_a") < F.col("id_b"),
        )
        .localCheckpoint(eager=False)
    )
    n = cand.count()
    fold = timed(
        lambda: noop(
            cand.select(hamming_fold(F.col("sa"), F.col("sb")).alias("h"))
        )
    )
    bits = timed(
        lambda: noop(
            cand.select(
                hamming_distance_bits(F.col("sa"), F.col("sb")).alias("h")
            )
        )
    )
    eq = (
        cand.select(
            (hamming_fold(F.col("sa"), F.col("sb"))
             == hamming_distance_bits(F.col("sa"), F.col("sb"))).alias("ok")
        )
        .agg(F.min("ok"))
        .collect()[0][0]
    )
    print(
        f"hamming A/B over {n} pairs: fold={fold:.2f}s bit_count={bits:.2f}s "
        f"({fold / bits:.1f}x) values_equal={eq}",
        flush=True,
    )


if __name__ == "__main__":
    main()

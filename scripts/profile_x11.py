#!/usr/bin/env python
"""Per-branch profile of x11_vocab_bpe: times the build call itself
(memo training + eager checkpoints + bounded collects) and each
variant's noop-sink execution (filter by variant constant-folds the
other union legs away).

Usage: python scripts/profile_x11.py [key] [variants...]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E
from pyspark.sql import functions as F
from kafkastreamsinteractivequeries_spark.session import get_spark


def main() -> None:
    key = sys.argv[1] if len(sys.argv) > 1 else "x11_vocab_bpe"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ksiq-profile")
    spark.sparkContext.setLogLevel("ERROR")
    queries = E.queries()
    fn = queries[key]
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # first build: includes memo training
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    print(f"build (cold, with memo training): {time.perf_counter()-t0:.3f}s")
    df.write.format("noop").mode("overwrite").save()

    for rep in range(2):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        tb = time.perf_counter() - t0
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        tx = time.perf_counter() - t0
        print(f"rep{rep}: build={tb:.3f}s exec={tx:.3f}s total={tb+tx:.3f}s")

    variants = sys.argv[2:]
    if not variants:
        variants = [
            r[0] for r in df.select("variant").distinct().collect()
        ]
    for v in sorted(variants):
        df = fn(spark, sf_dir)
        sub = df.filter(F.col("variant") == v)
        sub.write.format("noop").mode("overwrite").save()  # warm
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            sub.write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        print(f"  variant {v:12s} exec min={min(ts):.3f}s")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Time a subset of declared keys with the bench methodology (warm-up
pass, then N interleaved reps, per-key min, noop sink).

Usage: python scripts/ab_keys.py key [key ...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_AB_REPS (default 3).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E
from kafkastreamsinteractivequeries_spark.session import get_spark


def main() -> None:
    keys = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_AB_REPS", "3"))
    spark = get_spark("ksiq-ab")
    spark.sparkContext.setLogLevel("ERROR")
    queries = E.queries()
    unknown = [k for k in keys if k not in queries]
    if unknown:
        raise SystemExit(f"unknown keys: {unknown}")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for k in keys:  # warm-up
        queries[k](spark, sf_dir).write.format("noop").mode("overwrite").save()
    samples = {k: [] for k in keys}
    for _ in range(reps):
        for k in keys:
            t0 = time.perf_counter()
            queries[k](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples[k].append(time.perf_counter() - t0)
    for k in keys:
        print(
            f"{k}: min={min(samples[k]):.3f}s  "
            f"samples={', '.join(f'{x:.3f}' for x in samples[k])}"
        )


if __name__ == "__main__":
    main()

"""Wall measurement for the production Arrow BPE encoder: segment the
sf0.1 documents table with a 1,000-merge vocabulary (the scale the
expression path cannot express) and, for context, both paths at the
6-merge trajectory scale.

Usage: python scripts/bench_bpe_arrow.py [sf_dir]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from kafkastreamsinteractivequeries_spark.operators.text import (
    bpe_segment,
    bpe_segment_arrow,
    bpe_train,
)
from kafkastreamsinteractivequeries_spark.session import get_spark
from kafkastreamsinteractivequeries_spark.sources.tables import load_table


def timed(label, df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    print(f"{label}: {dt:.2f}s")
    return dt


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("bpe-bench")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n = docs.count()
    print(f"sf_dir={sf_dir} docs={n}")

    t0 = time.perf_counter()
    real = bpe_train(docs.limit(500), num_merges=40)
    print(f"train 40 merges on 500 docs: {time.perf_counter() - t0:.2f}s")
    merges_1k = real + [(f"<p{i}>", f"<q{i}>") for i in range(1000 - len(real))]

    # warm-up (JIT + python worker pool)
    timed("warmup expr(6)", bpe_segment(docs, real[:6]))

    timed("expr path, 6 merges", bpe_segment(docs, real[:6]))
    timed("arrow path, 6 merges", bpe_segment_arrow(docs, real[:6]))
    timed("arrow path, 40 merges", bpe_segment_arrow(docs, real))
    timed("arrow path, 1000 merges", bpe_segment_arrow(docs, merges_1k))


if __name__ == "__main__":
    main()

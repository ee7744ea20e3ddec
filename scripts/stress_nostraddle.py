"""Round-7 16x scale stress for no-straddle sequence packing: next-fit
runs per deterministic shard, so wall should grow ~linearly in rows
(one shuffle + Arrow shard-local fill) and per-task state stays one
integer regardless of corpus size.

Usage: python scripts/stress_nostraddle.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafkastreamsinteractivequeries_spark.operators.curation import (  # noqa: E402
    pack_sequences_no_straddle,
)
from kafkastreamsinteractivequeries_spark.session import get_spark  # noqa: E402
from kafkastreamsinteractivequeries_spark.sources.tables import load_table  # noqa: E402
from scripts.stress_scale import SF_DIR, build_16x  # noqa: E402


def timed(label, df):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    print(f"{label}: {dt:.1f}s")
    return dt


def main() -> None:
    spark = get_spark("stress-nostraddle")
    spark.sparkContext.setLogLevel("ERROR")
    _, doc16x = build_16x(spark)
    doc1 = load_table(spark, SF_DIR, "documents")
    doc16 = spark.read.parquet(doc16x)
    print(f"docs 1x={doc1.count()}, 16x={doc16.count()}")

    timed("warmup", pack_sequences_no_straddle(doc1, seq_len=2048, shards=32))
    t1 = timed("1x (shards=32)", pack_sequences_no_straddle(doc1, seq_len=2048, shards=32))
    t16 = timed("16x (shards=32)", pack_sequences_no_straddle(doc16, seq_len=2048, shards=32))
    # scale path: shards grow with the corpus so per-task rows stay flat
    t16s = timed(
        "16x (shards=512)", pack_sequences_no_straddle(doc16, seq_len=2048, shards=512)
    )
    print(f"wall growth at 16x, fixed shards: {t16 / t1:.1f}x")
    print(f"wall growth at 16x, scaled shards: {t16s / t1:.1f}x")


if __name__ == "__main__":
    main()

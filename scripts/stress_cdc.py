"""Round-7 16x stress for CDC chunk dedup: replicas are near-duplicates
by construction, so chunk hashes collide heavily across the 16 copies —
the adversarial case for the first-occurrence aggregate (hot hashes).
Healthy = ~linear wall in rows; the min-struct keeper combines map-side
so a 16-occurrence hash never serializes into one task.

Usage: python scripts/stress_cdc.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafkastreamsinteractivequeries_spark.operators.dedup import (  # noqa: E402
    cdc_chunk_dedup,
)
from kafkastreamsinteractivequeries_spark.session import get_spark  # noqa: E402
from kafkastreamsinteractivequeries_spark.sources.tables import load_table  # noqa: E402
from scripts.stress_scale import SF_DIR, build_16x  # noqa: E402


def timed(label, df):
    t0 = time.time()
    n = df.count()
    dt = time.time() - t0
    print(f"{label}: {dt:.1f}s ({n} chunk rows)")
    return dt


def main() -> None:
    spark = get_spark("stress-cdc")
    spark.sparkContext.setLogLevel("ERROR")
    _, doc16x = build_16x(spark)
    doc1 = load_table(spark, SF_DIR, "documents")
    doc16 = spark.read.parquet(doc16x)
    print(f"docs 1x={doc1.count()}, 16x={doc16.count()}")
    timed("warmup", cdc_chunk_dedup(doc1))
    t1 = timed("1x", cdc_chunk_dedup(doc1))
    t16 = timed("16x", cdc_chunk_dedup(doc16))
    dup16 = (
        cdc_chunk_dedup(doc16)
        .filter("NOT is_first")
        .count()
    )
    print(f"16x duplicate chunk rows: {dup16}")
    print(f"wall growth at 16x: {t16 / t1:.1f}x")


if __name__ == "__main__":
    main()

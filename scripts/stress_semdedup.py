"""SemDeDup 16x scale stress (SCALING.md methodology): replicate the
sf0.1 embeddings 16x (near-duplicate replicas, shifted ids), run
semdedup at 1x vs 16x, and compare walls under BOTH quantizer policies:

- n_lists fixed at 16: clusters grow 16x (~2000 members) and the
  within-cluster pair stage pays the quadratic corner - the WRONG
  100 TB config, timed to show why;
- n_lists scaled with the corpus (16 -> 256, holding target cluster
  size ~constant): the documented policy - wall should grow roughly
  linearly and the duplicate groups (each vector + its 15 perturbed
  replicas) must still be found.

Usage: python scripts/stress_semdedup.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kafkastreamsinteractivequeries_spark.operators.similarity import semdedup  # noqa: E402
from kafkastreamsinteractivequeries_spark.session import get_spark  # noqa: E402
from kafkastreamsinteractivequeries_spark.sources.tables import load_table  # noqa: E402
from scripts.stress_scale import SF_DIR, build_16x  # noqa: E402


def timed(label, fn, reps=2):
    best, n = None, None
    for _ in range(reps):
        t0 = time.time()
        n = fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label}: {best:.1f}s ({n} rows)", flush=True)
    return best


def main():
    spark = get_spark("stress-semdedup")
    spark.sparkContext.setLogLevel("ERROR")
    emb16x, _ = build_16x(spark)
    emb1 = load_table(spark, SF_DIR, "embeddings")
    emb16 = spark.read.parquet(emb16x)

    t1 = timed(
        "semdedup 1x (n_lists=16, t=0.99)",
        lambda: semdedup(emb1, n_lists=16, threshold=0.99).count(),
    )
    t16_fixed = timed(
        "semdedup 16x FIXED n_lists=16 (quadratic corner, t=0.99)",
        lambda: semdedup(emb16, n_lists=16, threshold=0.99).count(),
    )
    t16_scaled = timed(
        "semdedup 16x SCALED n_lists=256 (t=0.99)",
        lambda: semdedup(emb16, n_lists=256, threshold=0.99).count(),
    )
    # components policy head-to-head at 16x: the per-cluster union-find
    # (default) vs the global star iteration on the same scaled config
    t16_star = timed(
        "semdedup 16x SCALED components=star (t=0.99)",
        lambda: semdedup(
            emb16, n_lists=256, threshold=0.99, components="star"
        ).count(),
    )
    print(
        f"components local vs star at 16x: {t16_scaled:.1f}s vs "
        f"{t16_star:.1f}s ({t16_star / t16_scaled:.1f}x)",
        flush=True,
    )
    # sanity: with scaled lists the replica groups are still found
    out = semdedup(emb16, n_lists=256, threshold=0.99)
    stats = out.agg(
        F.countDistinct("group_id").alias("groups"),
        F.count("*").alias("members"),
        F.sum(F.col("keep").cast("int")).alias("kept"),
    ).collect()[0]
    print(
        f"16x scaled groups={stats.groups} members={stats.members} "
        f"kept={stats.kept} growth fixed={t16_fixed / t1:.1f}x "
        f"scaled={t16_scaled / t1:.1f}x",
        flush=True,
    )


if __name__ == "__main__":
    main()

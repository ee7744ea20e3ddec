"""Round-6 16x scale stress: exact-substring dup-span dedup and DSIR
importance weights (SCALING.md methodology — replicate sf0.1 documents
16x with shifted ids, time 1x vs 16x; healthy = roughly linear wall
growth).

The 16x corpus is an ADVERSARIAL input for dup-span detection: every
doc exists in 16 near-copies, so nearly the whole token stream becomes
duplicated spans.  A pair-based detector would go quadratic in the
duplicate multiplicity; the gram-count-window design must stay linear.

Usage: python scripts/stress_r6.py
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafkastreamsinteractivequeries_spark.session import get_spark  # noqa: E402
from kafkastreamsinteractivequeries_spark.sources.tables import load_table  # noqa: E402
from scripts.stress_scale import SF_DIR, build_16x  # noqa: E402


def timed(label, fn):
    t0 = time.time()
    n = fn()
    dt = time.time() - t0
    print(f"{label}: {dt:.1f}s ({n} rows)")
    return dt


def main():
    spark = get_spark("stress-r6")
    spark.sparkContext.setLogLevel("ERROR")
    _, doc16x = build_16x(spark)
    doc1 = load_table(spark, SF_DIR, "documents")
    doc16 = spark.read.parquet(doc16x)

    from kafkastreamsinteractivequeries_spark.operators.curation import (
        dsir_importance_weights,
    )
    from kafkastreamsinteractivequeries_spark.operators.dedup import (
        duplicate_span_stats,
        remove_duplicate_spans,
    )

    for name, op in (
        ("dupspan_stats", lambda df: duplicate_span_stats(df, k=8)),
        ("remove_spans", lambda df: remove_duplicate_spans(df, k=8)),
        (
            "dsir_weights",
            lambda df: dsir_importance_weights(df, df.filter(F.col("lang") == "en")),
        ),
    ):
        res = {}
        for label, df in (("1x", doc1), ("16x", doc16)):
            # materialize EVERY output column (a bare count() lets
            # Catalyst prune the trimmed-text computation entirely)
            def run(df=df, op=op):
                out = op(df)
                out.write.format("noop").mode("overwrite").save()
                return out.count()

            res[label] = timed(f"{name} {label}", run)
        print(f"{name} growth at 16x corpus: {res['16x'] / res['1x']:.1f}x\n")


if __name__ == "__main__":
    main()

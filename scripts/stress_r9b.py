#!/usr/bin/env python
"""Round-9 second stress batch: 16x wall ratios for the chat/SFT,
preference-pair, and objective-transform families.  Expected shapes:
chat parse/mask is one conv_id shuffle + map work (near-linear);
preference dedup aggregates skinny fingerprints (near-linear, dup
collapse is map-side); FIM/span are zero-shuffle map transforms
(bounded by string-expression throughput)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F

from kafkastreamsinteractivequeries_spark.session import get_spark
from kafkastreamsinteractivequeries_spark.operators import (
    chat as CH,
    objectives as OBJ,
    preference as P,
)

SF = "/root/testdata/sf0.1"
REPS = 3


def scale(df, factor, id_col="doc_id"):
    if factor == 1:
        return df
    parts = [
        df.select((F.col(id_col) + F.lit(i * 10_000_000)).alias(id_col),
                  *[c for c in df.columns if c != id_col])
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


def main():
    s = get_spark("stress-r9b")
    s.sparkContext.setLogLevel("FATAL")
    s.range(10).count()
    docs = s.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")

    rows = []
    for factor in (1, 16):
        d = scale(docs, factor).localCheckpoint()
        convs = d.select(
            (F.col("doc_id") % 997).alias("conv_id"),
            F.to_json(F.array(F.struct(
                F.lit("user").alias("role"), F.col("text").alias("content")
            ))).alias("messages"),
        )
        w = timed(lambda: noop(CH.chat_loss_mask(CH.parse_conversations(convs))))
        rows.append((f"chat_mask_{factor}x", w))

        pairs = d.select(
            F.col("doc_id").alias("pair_id"),
            F.col("text").alias("prompt"),
            F.concat(F.col("text"), F.lit(" good")).alias("chosen"),
            F.lit("no").alias("rejected"),
        )
        w = timed(lambda: noop(P.dedup_preference_pairs(pairs)))
        rows.append((f"pref_dedup_{factor}x", w))

        w = timed(lambda: noop(OBJ.fim_transform(d, rate_permille=500)))
        rows.append((f"fim_{factor}x", w))
        w = timed(lambda: noop(OBJ.span_corruption(d)))
        rows.append((f"span_{factor}x", w))

    by = dict(rows)
    for name, w in rows:
        print(f"{name}: {w:.2f}s")
    for fam in ("chat_mask", "pref_dedup", "fim", "span"):
        r = by[f"{fam}_16x"] / max(by[f"{fam}_1x"], 1e-9)
        print(f"RATIO {fam}: {by[f'{fam}_1x']:.2f}s -> {by[f'{fam}_16x']:.2f}s = {r:.2f}x")


if __name__ == "__main__":
    main()

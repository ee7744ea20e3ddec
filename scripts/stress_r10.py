#!/usr/bin/env python
"""Round-10 stress batch: 16x wall ratios for the token-ID training
emitter, the KN trigram LM, and the CLIP-pair gate/fuzzy-dedup tier.
Expected shapes: the emitter is map-only encode + one shard shuffle +
one (shard,bin) shuffle (near-linear); KN is partial-agg count tables
+ skinny-key joins (near-linear); the pair gates are one Arrow decode
pass (Python-throughput-bound); the hybrid near-dup is LSH-bounded
candidates + per-candidate folds."""
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F

from kafkastreamsinteractivequeries_spark.session import get_spark
from kafkastreamsinteractivequeries_spark.operators import (
    multimodal as M,
    text as T,
    training as TRN,
)
from kafkastreamsinteractivequeries_spark.operators.dedup import normalized_text
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


def main():
    spark = get_spark("stress-r10")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    docs = load_table(spark, SF, "documents")

    # frozen tokenizer artifacts (train once — the serve-many shape)
    traj = T.bpe_train_trajectory(docs, num_merges=6)
    merges = [(left, right) for _s, left, right, _n in traj]
    nonempty = docs.filter(normalized_text(F.col("text")) != "")
    seg1 = T.bpe_segment_arrow(nonempty, merges).localCheckpoint(eager=False)
    vmap = {
        r["piece"]: r["token_id"] for r in TRN.token_id_vocab(seg1).collect()
    }

    for factor in (1, 16):
        d = scale(docs, factor)
        ne = d.filter(normalized_text(F.col("text")) != "")

        def emitter():
            seg = T.bpe_segment_arrow(ne, merges)
            ids = TRN.encode_token_ids(seg, vmap)
            noop(TRN.token_training_examples(ids, seq_len=512, shards=32))

        print(f"token_training_examples x{factor}: {timed(emitter):.2f}s",
              flush=True)

        print(
            f"kneser_ney_trigram x{factor}: "
            f"{timed(lambda: noop(T.kneser_ney_trigram_scores(d))):.2f}s",
            flush=True,
        )

        pairs = M.png_assets_from_documents(d).join(
            d.select(
                F.col("doc_id").alias("asset_id"),
                F.col("text").alias("caption"),
            ),
            "asset_id",
        ).localCheckpoint(eager=False)
        print(
            f"image_pair_quality_gates x{factor}: "
            f"{timed(lambda: noop(M.image_pair_quality_gates(pairs, id_col='asset_id'))):.2f}s",
            flush=True,
        )
        print(
            f"image_caption_near_duplicates x{factor}: "
            f"{timed(lambda: noop(M.image_caption_near_duplicates(pairs, id_col='asset_id'))):.2f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()

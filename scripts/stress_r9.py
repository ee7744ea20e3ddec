#!/usr/bin/env python
"""Round-9 scale stress: wall ratios at 16x input for the new families
— unigram-LM training + Viterbi encode, the deterministic hashed
quantile sketch (+ merge), DCT pHash, and Goertzel band energies.

Expected shapes: unigram train is two corpus passes + bounded
collects (near-linear); the encode and both image/audio extractors
are map-only (near-linear, bounded by Python worker throughput); the
quantile sketch aggregates to distinct values first, so 16x rows over
the SAME value domain should be ~FLAT after the first aggregation
(the whole point of sketching).

Prints one line per row: name, 1x wall, 16x wall, ratio.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F

from kafkastreamsinteractivequeries_spark.session import get_spark
from kafkastreamsinteractivequeries_spark.operators import (
    multimodal as M,
    sketches as SK,
    text as T,
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
    s = get_spark("stress-r9")
    s.sparkContext.setLogLevel("FATAL")
    s.range(10).count()
    docs = s.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")

    rows = []

    # unigram-LM: train (bounded-vocab trajectory) + Arrow encode
    for factor in (1, 16):
        d = scale(docs, factor).localCheckpoint()
        wt = timed(lambda: T.unigram_lm_train(d, max_piece_len=4, top_k=40))
        vocab = T.unigram_lm_train(d, max_piece_len=4, top_k=40)
        we = timed(lambda: noop(T.unigram_segment_arrow(d, vocab)))
        rows.append((f"unigram_train_{factor}x", wt))
        rows.append((f"unigram_encode_{factor}x", we))

    # hashed quantile sketch over token lengths (+ merge of two halves)
    from kafkastreamsinteractivequeries_spark.operators.dedup import tokens_col

    for factor in (1, 16):
        d = scale(docs, factor).localCheckpoint()
        lens = d.select(F.size(tokens_col(F.col("text"))).cast("long").alias("v"))
        w = timed(lambda: noop(SK.hashed_quantile_sketch(lens, "v", k=256)))
        rows.append((f"qsketch_{factor}x", w))
    half_a = SK.hashed_quantile_sketch(
        docs.select(F.size(tokens_col(F.col("text"))).cast("long").alias("v")), "v", k=256
    ).localCheckpoint()
    wm = timed(lambda: noop(SK.merge_hashed_quantile_sketches(half_a, half_a, k=256)))
    rows.append(("qsketch_merge_sketch_sized", wm))

    # pHash + Goertzel over generated codec payloads
    for factor in (1, 16):
        d = scale(docs, factor).localCheckpoint()
        pngs = M.png_assets_from_documents(d).localCheckpoint()
        w = timed(lambda: noop(M.image_phash(pngs)))
        rows.append((f"phash_{factor}x", w))
        wavs = M.wav_assets_from_documents(d).localCheckpoint()
        w = timed(lambda: noop(M.wav_goertzel_band_energy(wavs, bins=(1, 4, 16), frame=256)))
        rows.append((f"goertzel_{factor}x", w))

    by = dict(rows)
    for name, w in rows:
        print(f"{name}: {w:.2f}s")
    for fam in ("unigram_train", "unigram_encode", "qsketch", "phash", "goertzel"):
        r = by[f"{fam}_16x"] / max(by[f"{fam}_1x"], 1e-9)
        print(f"RATIO {fam}: {by[f'{fam}_1x']:.2f}s -> {by[f'{fam}_16x']:.2f}s = {r:.2f}x")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Round-8 continuation scale stress: wall ratios at 16x input for the
session's new families — PageRank (edges x16), host stats/gate (URLs
x16), WordPiece MaxMatch encode (docs x16), MP3/FLAC manifest parse
(assets x16).

PageRank's per-iteration cost is one edge join + one dst aggregation,
so wall should scale ~linearly with edges (the rank table stays skinny:
nodes, not edges).  The others are map-only or single-aggregate shapes
and should scale sub-linearly on a 32-core local box (scan-bound).

Prints one line per row: name, 1x wall, 16x wall, ratio.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F

from kafkastreamsinteractivequeries_spark.session import get_spark
from kafkastreamsinteractivequeries_spark.operators import (
    dedup as D,
    graph as G,
    multimodal as M,
    text as T,
)
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


def wall(fn):
    best = None
    for _ in range(REPS):
        t0 = time.monotonic()
        fn()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    return best


def main():
    spark = get_spark("stress-r8b")
    spark.sparkContext.setLogLevel("FATAL")
    docs = load_table(spark, SF, "documents").localCheckpoint()
    ev = load_table(spark, SF, "events").localCheckpoint()

    rows = []

    # PageRank: scaled-edge copies keep src/dst structure but shift ids
    # so the graph gets 16x edges AND 16x nodes (the hard direction).
    def pr(factor):
        e = ev.select(
            F.col("user_id").alias("src"),
            ((F.col("event_id") * 7 + 3) % 41).alias("dst"),
        )
        if factor > 1:
            parts = [
                e.select(
                    (F.col("src") + F.lit(i * 1_000_000)).alias("src"),
                    (F.col("dst") + F.lit(i * 1_000_000)).alias("dst"),
                )
                for i in range(factor)
            ]
            e = parts[0]
            for p in parts[1:]:
                e = e.unionByName(p)
        edges = G.normalize_edges(e)
        return lambda: G.pagerank(edges, iterations=3).agg(
            F.sum("rank")
        ).collect()

    w1, w16 = wall(pr(1)), wall(pr(16))
    rows.append(("pagerank_3iter", w1, w16))

    # Host stats + gate over the salted URL formula
    def hosts(factor):
        d = scale(docs, factor)
        urls = d.select(
            "doc_id",
            F.concat(
                F.lit("https://example"),
                (F.col("doc_id") % 997).cast("string"),
                F.lit(".com/p"),
                (F.col("doc_id") % 61).cast("string"),
            ).alias("url"),
        )
        return lambda: D.host_gate(urls).agg(
            F.sum("n_docs"), F.sum("blocked")
        ).collect()

    w1, w16 = wall(hosts(1)), wall(hosts(16))
    rows.append(("host_gate", w1, w16))

    # WordPiece MaxMatch encode with a 120-piece vocab
    vrows = T.wordpiece_vocab(docs).collect()
    vs = [r["piece"] for r in vrows if r["is_cont"] == 0]
    vc = [r["piece"] for r in vrows if r["is_cont"] == 1]

    def wp(factor):
        d = scale(docs, factor)
        return lambda: T.wordpiece_segment_arrow(d, vs, vc).agg(
            F.sum("n_wp_tokens")
        ).collect()

    w1, w16 = wall(wp(1)), wall(wp(16))
    rows.append(("wordpiece_encode", w1, w16))

    # MP3 + FLAC manifest parse
    def mf(factor):
        d = scale(docs, factor)
        return lambda: M.mp3_flac_manifest(
            M.mp3_assets_from_documents(d), M.flac_assets_from_documents(d)
        ).agg(F.count("checksum"), F.sum("duration_ms")).collect()

    w1, w16 = wall(mf(1)), wall(mf(16))
    rows.append(("mp3_flac_manifest", w1, w16))

    for name, a, b in rows:
        print(f"{name:24s} 1x={a:7.2f}s 16x={b:7.2f}s ratio={b / a:5.2f}")


if __name__ == "__main__":
    main()

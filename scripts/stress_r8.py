#!/usr/bin/env python
"""Round-8 scale stress: wall ratios at 16x input for the new families
(URL dedup, mojibake repair, WebP/TIFF manifest) plus the append-ingest
invariance argument — append a FIXED batch into landed code stores of
1x and 16x rows; the append wall must be ~flat because the operator
never reads the store (the whole point).

Prints one line per row: name, 1x wall, 16x wall, ratio.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F

from kafkastreamsinteractivequeries_spark.session import get_spark
from kafkastreamsinteractivequeries_spark.operators import (
    dedup as D,
    multimodal as M,
    similarity as S,
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


def main():
    s = get_spark("stress-r8")
    s.sparkContext.setLogLevel("FATAL")
    s.range(10).count()
    docs = s.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    emb = s.read.parquet(f"{SF}/embeddings.parquet")

    did = F.col("doc_id")
    url = F.concat(
        F.lit("HTTPS://U:PW@Example"), (did % 997).cast("string"),
        F.lit(".COM:443/p"), (did % 61).cast("string"),
        F.lit("?b=2&utm_source=x&a=1#f"),
    )

    rows = []

    def run(name, make):
        w1 = timed(lambda: make(1).count())
        w16 = timed(lambda: make(16).count())
        rows.append((name, w1, w16, w16 / w1))
        print(f"{name:<22} 1x={w1:6.2f}s 16x={w16:6.2f}s ratio={w16 / w1:5.2f}",
              flush=True)

    run("url_dedup", lambda f: D.url_dedup(
        scale(docs, f).select("doc_id", url.alias("url"))))
    run("mojibake_repair", lambda f: scale(docs, f).select(
        F.md5(T.repair_mojibake_col(F.col("text"))).alias("h")))
    run("webp_tiff_manifest", lambda f: M.webp_tiff_manifest(
        M.webp_assets_from_documents(scale(docs, f)),
        M.tiff_assets_from_documents(scale(docs, f))))

    # append invariance: the PER-BATCH ingest cost (encode a FIXED 5k
    # batch + write its own partition, the StreamingPqCodeSink shape)
    # with the landed store at 1x vs 16x rows — must be ~flat because
    # the append never reads the store.  For contrast, also time the
    # READER (one full-store scan), which is allowed to be ~16x.
    import os
    import shutil
    import tempfile

    book = S.pq_train(emb, m=8, k=16, iterations=2)
    batch = emb.limit(5000)
    stores = {}
    for f in (1, 16):
        store = os.path.join(tempfile.gettempdir(), f"r8codes_{f}x.parquet")
        stores[f] = store
        if not os.path.exists(store):
            scaled = scale(emb, f, id_col="vec_id")
            S.pq_codes(scaled, book).write.mode("overwrite").parquet(
                f"{store}/batch=0"
            )

    def append_batch(f):
        out = f"{stores[f]}/batch=999"
        shutil.rmtree(out, ignore_errors=True)
        S.pq_codes(batch, book).write.mode("overwrite").parquet(out)
        shutil.rmtree(out, ignore_errors=True)

    w1 = timed(lambda: append_batch(1))
    w16 = timed(lambda: append_batch(16))
    print(f"{'append_batch_ingest':<22} 1x={w1:6.2f}s 16x={w16:6.2f}s "
          f"ratio={w16 / w1:5.2f}  (fixed 5k batch, store 1x vs 16x)",
          flush=True)
    r1 = timed(lambda: s.read.parquet(f"{stores[1]}/batch=0").count())
    r16 = timed(lambda: s.read.parquet(f"{stores[16]}/batch=0").count())
    print(f"{'store_full_scan':<22} 1x={r1:6.2f}s 16x={r16:6.2f}s "
          f"ratio={r16 / r1:5.2f}  (reader cost, expected ~linear)",
          flush=True)


if __name__ == "__main__":
    main()

"""Runnable end-to-end demo: the full training-data pipeline on the
synthetic testdata, stage by stage — what a user switching from the
reference app (plus a data-curation stack) runs on day one.

    python scripts/example_pipeline.py [sf_dir] [out_dir]

Stages: validate → curate (quality gate + PII redaction + dedup +
near-dup + decontamination + token budget) → Z-order layout → ANN
index build + persist → interactive query serving (the reference's
IQ surface) → telemetry sketches.  Each stage prints a one-line
summary; everything runs on one local SparkSession.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafkastreamsinteractivequeries_spark.session import get_spark
from kafkastreamsinteractivequeries_spark.sources.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="pipeline_")
    spark = get_spark("example-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. validate the raw drop before anything lands
    from kafkastreamsinteractivequeries_spark.operators.quality import (
        check_constraints,
    )

    docs = load_table(spark, sf_dir, "documents")
    report = check_constraints(
        docs,
        [
            ("not_null", "doc_id"),
            ("unique", ["doc_id"]),
            ("not_null", "text"),
            ("expr", "chars_match", "n_chars IS NULL OR n_chars >= 0"),
        ],
    ).collect()
    bad = [r for r in report if not r["passed"]]
    print(f"[1 validate] {len(report)} rules, {len(bad)} failed")
    assert not bad, bad

    # 2. curate: quality gate → redact → dedup → near-dup → decontaminate
    #    (n-gram + embedding) → token budget
    from kafkastreamsinteractivequeries_spark.operators.curation import (
        curate_documents,
    )

    vecs = load_table(spark, sf_dir, "embeddings")
    eval_docs = docs.filter(F.col("doc_id") % 20 == 0)
    eval_vecs = vecs.filter(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("eval_id"), "embedding"
    )
    train_docs = docs.filter(F.col("doc_id") % 20 != 0)
    curated = curate_documents(
        train_docs,
        min_quality=0.5,
        near_dup_threshold=0.8,
        token_budget=1_000_000,
        decontaminate_against=eval_docs,
        decontaminate_n=3,
        decontaminate_embeddings=(vecs, eval_vecs),
        redact=True,
    )
    n_curated = curated.count()
    print(f"[2 curate] {train_docs.count()} raw -> {n_curated} curated docs")

    # 3. land the curated corpus Z-ordered for multi-dim scan pruning
    from kafkastreamsinteractivequeries_spark.operators.layout import (
        cluster_by_zorder,
        file_stat_tightness,
    )

    corpus_path = os.path.join(out_dir, "curated")
    cluster_by_zorder(
        curated,
        [("doc_id", 0, 10_000_000), ("n_tokens", 0, 512)],
        bits=12,
        num_partitions=8,
    ).drop("_zkey").write.mode("overwrite").parquet(corpus_path)
    tight = file_stat_tightness(corpus_path, ["doc_id", "n_tokens"])
    print(
        f"[3 layout] landed {corpus_path}; mean stat span "
        f"doc_id={tight['doc_id']:.2f} n_tokens={tight['n_tokens']:.2f}"
    )

    # 4. build + persist the ANN index artifacts, then one-scan encode
    from kafkastreamsinteractivequeries_spark.operators import similarity as S

    cent = S.ivf_train(vecs, n_lists=16, iterations=2)
    book = S.pq_train(vecs, m=8, k=16, iterations=2)
    S.save_index(cent, os.path.join(out_dir, "ivf_centroids"))
    S.save_index(book, os.path.join(out_dir, "pq_codebook"))
    cent2 = S.load_ivf_centroids(spark, os.path.join(out_dir, "ivf_centroids"))
    book2 = S.load_pq_codebook(spark, os.path.join(out_dir, "pq_codebook"))
    encoded = S.encode_all(vecs, centroids=cent2, codebook=book2, num_planes=32)
    print(f"[4 index] trained + persisted; encoded {encoded.count()} vectors in one scan")

    # 5. the reference's interactive-query surface over the event stream
    from kafkastreamsinteractivequeries_spark.operators.aggregation import (
        aggregate_transactions,
    )
    from kafkastreamsinteractivequeries_spark.plans.queries import (
        FilteredRangeQuery,
        KeyQuery,
    )
    from kafkastreamsinteractivequeries_spark.plans.service import (
        InteractiveQueryService,
    )
    from kafkastreamsinteractivequeries_spark.sources.tables import (
        transactions_from_events,
    )

    agg = aggregate_transactions(
        transactions_from_events(load_table(spark, sf_dir, "events"))
    )
    svc = InteractiveQueryService(agg)
    key_row = svc.execute(KeyQuery.with_key("purchase")).collect()
    filtered = svc.execute(
        FilteredRangeQuery.with_bounds(None, None).predicate("@.buys > @.sells")
    ).count()
    print(f"[5 serve] keyquery rows={len(key_row)}; filtered-range rows={filtered}")

    # 6. telemetry: cardinality + segment overlap without exact distincts
    from kafkastreamsinteractivequeries_spark.operators import sketches as SK

    ev = load_table(spark, sf_dir, "events")
    hll = SK.hll_distinct(ev, "user_id", ["event_type"], p=6).count()
    overlap = SK.kmv_overlap(ev, "user_id", "event_type", k=32).count()
    print(f"[6 telemetry] hll groups={hll}; segment pairs={overlap}")
    print(f"done; artifacts under {out_dir}")


if __name__ == "__main__":
    main()

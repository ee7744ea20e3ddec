"""Runnable end-to-end demo: the full training-data pipeline on the
synthetic testdata, stage by stage — what a user switching from the
reference app (plus a data-curation stack) runs on day one.

    python scripts/example_pipeline.py [sf_dir] [out_dir]

Stages: validate → line-level dedup → curate (quality gate + PII
redaction + dedup + near-dup + decontamination + token budget) →
temperature mixture + sequence packing → Z-order layout + compaction
plan → ANN index build + persist → interactive query serving (the
reference's IQ surface) → telemetry sketches → rollup partials landing
+ merged report.  Each stage prints a one-line summary; everything
runs on one local SparkSession.
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

    # 1b. line-level dedup (C4 §2.2): drop boilerplate lines repeated
    #     across docs, keep the first corpus-wide occurrence.  The
    #     synthetic corpus has no newlines, so 12-token lines are
    #     synthesized for the demo.
    from kafkastreamsinteractivequeries_spark.operators.dedup import line_dedup

    toks = F.split("text", " ")
    lined = docs.withColumn(
        "text",
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.floor((F.size(toks) - 1) / 12).cast("int")),
                lambda i: F.array_join(F.slice(toks, i * 12 + 1, 12), " "),
            ),
            "\n",
        ),
    )
    ld = line_dedup(lined)
    removed = ld.agg(F.sum("removed_lines"), F.sum("n_lines")).collect()[0]
    docs = (
        ld.filter(F.col("kept_lines") > 0)
        .select("doc_id", F.regexp_replace("text", "\n", " ").alias("text"))
        .join(docs.drop("text"), "doc_id")
    )
    print(f"[1b line-dedup] removed {removed[0]}/{removed[1]} lines corpus-wide")

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

    # 2b. assemble the training mix: α=0.5 temperature re-weighting over
    #     sources, then pack into fixed token-budget sequences
    from kafkastreamsinteractivequeries_spark.operators.curation import (
        pack_sequences,
        temperature_mixture,
    )

    mix = temperature_mixture(curated, total=min(200, n_curated), alpha=0.5)
    # curate_documents prunes the payload to stats columns; re-attach
    # text for the packer
    packed = pack_sequences(mix.join(docs.select("doc_id", "text"), "doc_id"), seq_len=512)
    n_bins = packed.agg(F.countDistinct("bin_id")).collect()[0][0]
    print(f"[2b mix+pack] {mix.count()} sampled docs -> {n_bins} packed 512-token bins")

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

    # 3b. compaction plan over the landed shard's file manifest: bin the
    #     parquet files to ~1 MiB rewrite targets (planning only — the
    #     execution half is a per-bin coalesced read+write)
    import glob

    from kafkastreamsinteractivequeries_spark.operators.layout import plan_compaction

    manifest = spark.createDataFrame(
        [(p, os.path.getsize(p)) for p in glob.glob(f"{corpus_path}/*.parquet")],
        "path string, size long",
    )
    bins = plan_compaction(manifest, "size", 1 << 20)
    n_bins = bins.agg(F.countDistinct("bin_id")).collect()[0][0]
    print(f"[3b compact] {manifest.count()} files -> {n_bins} rewrite bins")

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

    # 7. continuous-aggregate maintenance: land hour-grain partials once,
    #    answer the daily report from the landed partials alone
    from kafkastreamsinteractivequeries_spark.operators.rollup import (
        merge_partials,
        partial_aggregate,
    )

    txns = transactions_from_events(ev).withColumn(
        "amount", F.col("amount").cast("decimal(18,6)")
    )
    partials_path = os.path.join(out_dir, "partials_hour")
    partial_aggregate(
        txns, ["symbol"], "event_time", "hour", {"amount": ["sum", "min", "max"]}
    ).write.mode("overwrite").parquet(partials_path)
    landed = spark.read.parquet(partials_path)
    daily = merge_partials(landed, ["symbol"], grain="day")
    print(
        f"[7 rollup] landed {landed.count()} hour partials; "
        f"daily report = {daily.count()} rows without re-reading events"
    )
    print(f"done; artifacts under {out_dir}")


if __name__ == "__main__":
    main()

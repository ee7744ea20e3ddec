"""Parity + scale tests for the production Arrow BPE encoder
(`bpe_segment_arrow`) against the expression path (`bpe_segment`)."""

from pyspark.sql import functions as F

from kafkastreamsinteractivequeries_spark.operators.dedup import normalized_text
from kafkastreamsinteractivequeries_spark.operators.text import (
    bpe_segment,
    bpe_segment_arrow,
    bpe_train,
)
from kafkastreamsinteractivequeries_spark.sources.tables import load_table


def _canon(df):
    return sorted(
        (r["doc_id"], tuple(r["bpe_tokens_learned"] or ()), r["n_bpe_tokens"])
        for r in df.collect()
    )


def test_bpe_segment_arrow_matches_expression_path(spark, sf_dir):
    """The production mapInPandas encoder must reproduce the expression
    path exactly: on the real documents table (6 trained merges, the
    verified trajectory scale) and on edge-case rows — null text, empty
    text, whitespace-only text, identical-symbol runs."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    merges = bpe_train(docs.limit(200), num_merges=6)
    assert len(merges) == 6

    assert _canon(bpe_segment_arrow(docs, merges)) == _canon(
        bpe_segment(docs, merges)
    )

    edge = spark.createDataFrame(
        [
            (1, None),
            (2, ""),
            (3, "   \t  "),
            (4, "aaaaaa aaaaaa newest"),
            (5, "Mixed   CASE \n multi\tspace"),
        ],
        "doc_id long, text string",
    )
    assert _canon(bpe_segment_arrow(edge, merges)) == _canon(
        bpe_segment(edge, merges)
    )
    # map-only, Arrow-batched: no shuffle, no row-at-a-time Python
    plan = (
        bpe_segment_arrow(docs, merges)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan
    assert "Join" not in plan


def test_bpe_segment_arrow_handles_thousand_merge_vocabulary(spark, sf_dir):
    """The scale the expression path cannot reach: a 1,000-merge
    vocabulary applies in one Arrow pass (the expression form would
    unroll 1,000 nested folds).  Output must stay a valid segmentation:
    concatenating each doc's tokens reconstructs the normalized text
    with per-word end markers."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    real = bpe_train(docs.limit(300), num_merges=40)
    # pad to 1,000 with synthetic never-matching merges — cost-realistic
    # (each still pays the substring pre-filter per distinct word)
    merges = real + [(f"<p{i}>", f"<q{i}>") for i in range(1000 - len(real))]
    seg = bpe_segment_arrow(docs, merges)
    rebuilt = F.array_join(
        F.transform(
            F.split(normalized_text(F.col("text")), " "),
            lambda w: F.concat(w, F.lit("</w>")),
        ),
        "",
    )
    joined = seg.join(docs, "doc_id").select(
        "doc_id",
        (F.array_join("bpe_tokens_learned", "") == rebuilt).alias("ok"),
    )
    assert joined.filter(~F.col("ok")).count() == 0

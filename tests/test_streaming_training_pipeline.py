"""End-to-end STREAMING training-data pipeline: documents arrive as a
file stream, pass the streaming curation front (redact → quality gate
→ watermark dedup), and land TOKENIZED through StreamingTokenIdSink —
the landed id store must equal the batch pipeline (same curation
Column expressions + one-shot encode) run over the same corpus.

This pins that the curation operators and the frozen-artifact encoder
COMPOSE on a live stream, the streaming twin of the batch
corpus→training-file loop (training.token_training_examples packs the
landed ids when a run is cut)."""

import datetime as dt

from pyspark.sql import functions as F

from kafkastreamsinteractivequeries_spark.operators.text import (
    _stats_cols,
    bpe_segment_arrow,
    bpe_train_trajectory,
    redacted_text_col,
)
from kafkastreamsinteractivequeries_spark.operators.training import (
    encode_token_ids,
    token_id_vocab,
)
from kafkastreamsinteractivequeries_spark.streaming.pipeline import (
    StreamingTokenIdSink,
    streaming_curation,
)
import pytest

# excluded from the default gate (streaming training soak); see pytest.ini
pytestmark = pytest.mark.slow

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def test_streaming_curated_token_ids_match_batch(spark, tmp_path):
    rows = [
        (1, "the cat sat on the mat quite happily today", T0),
        (2, "the cat sat on the mat quite happily today", T0),  # exact dup
        (3, "x", T0),  # fails the quality gate (too short)
        (4, "a dog and a log and a cat sat down together", T0),
        (5, "email me at a@b.com about the cat and the mat", T0),  # redacts
        (6, "the dog dug under the log while the cat napped", T0),
    ]
    schema = "doc_id long, text string, event_time timestamp"
    docs = spark.createDataFrame(rows, schema)

    # frozen tokenizer artifacts, trained once on the raw corpus
    traj = bpe_train_trajectory(docs, num_merges=4)
    merges = [(left, right) for _s, left, right, _n in traj]
    vocab = {
        r["piece"]: r["token_id"]
        for r in token_id_vocab(bpe_segment_arrow(docs, merges)).collect()
    }

    src = str(tmp_path / "docs")
    for r in range(3):  # three files → three micro-batches
        docs.filter(F.col("doc_id") % 3 == r).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    curated = streaming_curation(stream, min_quality=0.5)
    sink = StreamingTokenIdSink(str(tmp_path / "store"), merges, vocab)
    q = (
        curated.select("doc_id", "text")
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    landed = {
        r["doc_id"]: list(r["token_ids"])
        for r in sink.token_ids(spark).collect()
    }

    # batch twin: same redaction + gate expressions, exact dedup by
    # normalized fingerprint (first id wins), one-shot encode
    red = docs.withColumn("text", redacted_text_col("text"))
    gated = (
        red.select("*", *_stats_cols("text"))
        .filter(F.col("quality_score") >= 0.5)
        .select("doc_id", "text")
    )
    batch_ids = {
        r["doc_id"]: list(r["token_ids"])
        for r in encode_token_ids(bpe_segment_arrow(gated, merges), vocab).collect()
    }

    # doc 3 gated out everywhere; one of the dup pair (1, 2) was
    # dropped by the streaming dedup (which one depends on batch
    # arrival order — both have identical ids, so assert on content)
    assert 3 not in landed
    assert len({1, 2} & set(landed)) == 1
    dup_id = ({1, 2} & set(landed)).pop()
    assert landed[dup_id] == batch_ids[1] == batch_ids[2]
    for did in (4, 5, 6):
        assert landed[did] == batch_ids[did], did
    # redaction happened BEFORE tokenization on both paths: the landed
    # ids of doc 5 decode without the raw address
    inv = {v: k for k, v in vocab.items()}
    pieces5 = "".join(inv.get(t, "?") for t in landed[5])
    assert "a@b.com" not in pieces5

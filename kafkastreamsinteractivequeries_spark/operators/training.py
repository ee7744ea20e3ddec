"""Token-ID training-example emission — the LAST hop from a curated,
tokenized corpus to tensor-ready training shards.

The tokenizer family (``text.bpe_segment_arrow`` /
``wordpiece_segment_arrow`` / ``unigram_segment_arrow``) emits string
PIECES; a training job consumes integer ids laid out in fixed-length
bins with a loss mask and per-document attention boundaries.  This
module composes the existing pieces into that final table:

1. ``token_id_vocab`` — frequency-ranked piece→id table (ids start
   after the 4 reserved specials: pad=0, unk=1, bos=2, eos=3 — the
   GPT-2/SentencePiece convention of a small reserved prefix).
2. ``encode_token_ids`` — map each document's piece array to an
   integer id array (Arrow ``mapInPandas``, vocab closure-captured
   once per executor — the production shape shared with
   ``bpe_segment_arrow``), appending one EOS id per document as the
   document separator.
3. ``token_training_examples`` — pack documents WHOLE into
   fixed-``seq_len`` bins (``curation.pack_sequences_no_straddle``,
   the contamination-free layout of Krell et al. arXiv:2107.02027)
   and assemble per-bin tensors: ``input_ids`` padded to ``seq_len``
   with pad=0, ``loss_mask`` (1 on real tokens, 0 on padding), and
   ``segment_ids`` (1-based document index per position, 0 on
   padding — the block-diagonal attention boundary table).

Every step is deterministic and engine-replayable: vocab ids come
from the (count DESC, piece ASC) total order, packing from next-fit
in id order per deterministic shard, and bin assembly from sorted
struct collection — the DuckDB oracle replays ids, bin layout, and
all three rendered tensors exactly (driver key x11, 'tokvocab' ⊕
'tokids' ⊕ 'tokbin' variants).

Scale shape: the vocab is the only driver-side collect (bounded by
vocab size — the train-once/serve-many convention); encode is
map-only; packing shuffles once on the shard id; bin assembly
shuffles once on (shard, bin_id).  No row-at-a-time Python, no
unbounded state.

Reference parity note: the reference engine (Kafka Streams
interactive queries) has no tokenizer surface — this module is part
of the north-star LLM-data-pipeline extension suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

PAD_ID = 0
UNK_ID = 1
BOS_ID = 2
EOS_ID = 3
N_SPECIALS = 4


def token_id_vocab(
    segmented: DataFrame,
    pieces_col: str = "bpe_tokens_learned",
) -> DataFrame:
    """Frequency-ranked token-id table from a segmented corpus:
    (piece, count, token_id) with ``token_id = N_SPECIALS - 1 + rank``
    under the (count DESC, piece ASC) total order — deterministic,
    engine-replayable, and collision-free by construction.

    The ranking window is intentionally global (single partition):
    its input is the piece-distinct aggregate, bounded by vocabulary
    size (30k-class at production scale), never by corpus size — the
    same bounded-collect envelope as ``wordpiece_vocab``."""
    counts = (
        segmented.select(F.explode(pieces_col).alias("piece"))
        .groupBy("piece")
        .agg(F.count("*").cast("long").alias("count"))
    )
    w = Window.orderBy(F.desc("count"), F.asc("piece"))
    return counts.select(
        "piece",
        "count",
        (F.row_number().over(w) + F.lit(N_SPECIALS - 1))
        .cast("int")
        .alias("token_id"),
    )


def encode_token_ids(
    segmented: DataFrame,
    vocab: dict[str, int],
    pieces_col: str = "bpe_tokens_learned",
    id_col: str = "doc_id",
    append_eos: bool = True,
) -> DataFrame:
    """Map each document's piece array to integer token ids:
    (id, token_ids array<int>, n_ids int).  Unknown pieces map to
    ``UNK_ID``; ``append_eos`` adds one ``EOS_ID`` per document (the
    standard document-separator convention, so concatenated bins
    keep document boundaries recoverable from the ids alone).

    Arrow ``mapInPandas``, map-only: the vocab dict is
    closure-captured once per executor (train-once/serve-many — the
    ``bpe_segment_arrow`` shape), never joined per token.  A NULL
    piece array (NULL text upstream) degrades to NULL ids, the
    family's degrade convention."""
    id_type = dict(segmented.dtypes)[id_col]
    schema = f"{id_col} {id_type}, token_ids array<int>, n_ids int"
    tail = [EOS_ID] if append_eos else []

    def encode_batches(batches):
        import pandas as pd

        for pdf in batches:
            ids_out, ns = [], []
            for pieces in pdf[pieces_col]:
                if pieces is None or (
                    isinstance(pieces, float) and pieces != pieces
                ):
                    ids_out.append(None)
                    ns.append(None)
                    continue
                ids = [vocab.get(p, UNK_ID) for p in pieces] + tail
                ids_out.append(ids)
                ns.append(len(ids))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "token_ids": ids_out,
                    "n_ids": ns,
                }
            )

    return segmented.select(id_col, pieces_col).mapInPandas(
        encode_batches, schema
    )


def token_training_examples(
    ids_df: DataFrame,
    seq_len: int = 2048,
    shards: int = 32,
    id_col: str = "doc_id",
    ids_col: str = "token_ids",
) -> DataFrame:
    """Assemble tensor-ready training bins from per-document token
    ids: (shard, bin_id, n_docs, n_tokens, truncated, doc_ids,
    input_ids, loss_mask, segment_ids).

    - ``input_ids``: the bin's documents' ids concatenated in id
      order, truncated to ``seq_len`` (only oversize single-doc bins
      truncate — next-fit places an oversize document ALONE in its
      bin, so truncation never crosses a document boundary), padded
      to exactly ``seq_len`` with ``PAD_ID``.
    - ``loss_mask``: 1 per real token (EOS included — the separator
      is a trained position), 0 per pad.
    - ``segment_ids``: the 1-based in-bin document index per
      position, 0 on padding — enough to reconstruct block-diagonal
      attention without re-tokenizing.
    - ``doc_ids``: the documents in the bin, in layout order.

    Packing is ``pack_sequences_no_straddle`` on the precomputed
    ``n_ids`` column (one shuffle on the deterministic shard id);
    assembly is one groupBy (shard, bin_id) with sorted struct
    collection — per-task state is one bin (≤ seq_len ids plus the
    oversize tail), never a corpus-sized buffer.  All Column
    expressions; deterministic under any partitioning."""
    from kafkastreamsinteractivequeries_spark.operators.curation import (
        pack_sequences_no_straddle,
    )

    packed = pack_sequences_no_straddle(
        ids_df,
        seq_len=seq_len,
        shards=shards,
        id_col=id_col,
        n_tokens_col="n_ids",
    )
    joined = packed.select(id_col, "shard", "bin_id").join(
        ids_df.select(F.col(id_col), F.col(ids_col).alias("_ids")), id_col
    )
    grouped = joined.groupBy("shard", "bin_id").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col(id_col).alias("did"), F.col("_ids")))
        ).alias("_docs")
    )
    d = F.col("_docs")
    # stage the concatenated/truncated id stream and the segment
    # stream ONCE (multiply-referenced non-cheap subtrees re-inline
    # otherwise — the staged-struct rule)
    staged = grouped.withColumns(
        {
            "_all": F.flatten(F.transform(d, lambda x: x["_ids"])),
            "_segs": F.flatten(
                F.transform(
                    d,
                    lambda x, j: F.array_repeat(
                        (j + 1).cast("int"), F.size(x["_ids"])
                    ),
                )
            ),
        }
    ).withColumns(
        {
            "_real": F.slice(F.col("_all"), 1, seq_len),
        }
    ).withColumns(
        {
            "_nreal": F.size(F.col("_real")),
        }
    )
    nreal = F.col("_nreal")
    pad_n = (F.lit(seq_len) - nreal).cast("int")
    return staged.select(
        F.col("shard"),
        F.col("bin_id"),
        F.size(d).cast("int").alias("n_docs"),
        nreal.cast("int").alias("n_tokens"),
        (F.size(F.col("_all")) > seq_len).alias("truncated"),
        F.transform(d, lambda x: x["did"]).alias("doc_ids"),
        F.concat(
            F.col("_real"),
            F.array_repeat(F.lit(PAD_ID).cast("int"), pad_n),
        ).alias("input_ids"),
        F.concat(
            F.array_repeat(F.lit(1).cast("int"), nreal.cast("int")),
            F.array_repeat(F.lit(0).cast("int"), pad_n),
        ).alias("loss_mask"),
        F.concat(
            F.slice(F.col("_segs"), 1, seq_len),
            F.array_repeat(F.lit(0).cast("int"), pad_n),
        ).alias("segment_ids"),
    )

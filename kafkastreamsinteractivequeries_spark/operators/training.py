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


#: role-marker token ids for the SFT emitter — reserved directly
#: after the 4 base specials (the ChatML-style turn delimiters as
#: single ids); piece ids for SFT vocabularies start at
#: ``N_SFT_SPECIALS`` so markers never collide with content
ROLE_IDS = {"system": 4, "user": 5, "assistant": 6}
N_SFT_SPECIALS = 7


def token_id_vocab(
    segmented: DataFrame,
    pieces_col: str = "bpe_tokens_learned",
    first_id: int = N_SPECIALS,
) -> DataFrame:
    """Frequency-ranked token-id table from a segmented corpus:
    (piece, count, token_id) with ``token_id = first_id - 1 + rank``
    under the (count DESC, piece ASC) total order — deterministic,
    engine-replayable, and collision-free by construction.
    ``first_id`` defaults to the 4 base specials; the SFT path passes
    ``N_SFT_SPECIALS`` to also reserve the role-marker ids.

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
        (F.row_number().over(w) + F.lit(first_id - 1))
        .cast("int")
        .alias("token_id"),
    )


def encode_token_ids(
    segmented: DataFrame,
    vocab: dict[str, int],
    pieces_col: str = "bpe_tokens_learned",
    id_col: str = "doc_id",
    append_eos: bool = True,
    carry_cols: tuple[str, ...] = (),
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
    family's degrade convention.

    ``carry_cols``: extra input columns passed through unchanged and
    appended after the id columns — lets a caller materialize pieces
    and ids in ONE pass (one checkpoint instead of two) when both
    tables are needed downstream."""
    dtypes = dict(segmented.dtypes)
    id_type = dtypes[id_col]
    schema = f"{id_col} {id_type}, token_ids array<int>, n_ids int"
    for c in carry_cols:
        schema += f", {c} {dtypes[c]}"
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
            out = {
                id_col: pdf[id_col],
                "token_ids": ids_out,
                "n_ids": ns,
            }
            for c in carry_cols:
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    cols = [id_col, pieces_col] + [
        c for c in carry_cols if c != pieces_col
    ]
    return segmented.select(*cols).mapInPandas(encode_batches, schema)


def token_training_examples(
    ids_df: DataFrame,
    seq_len: int = 2048,
    shards: int = 32,
    id_col: str = "doc_id",
    ids_col: str = "token_ids",
    mask_col: str | None = None,
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
      is a trained position), 0 per pad.  When ``mask_col`` names a
      per-document mask array ALIGNED with ``ids_col`` (the SFT
      role-aware path), the bin mask is that array laid out/truncated
      /padded exactly like the ids instead of all-1s.
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
    carry = [F.col(id_col), F.col(ids_col).alias("_ids")]
    if mask_col is not None:
        carry.append(F.col(mask_col).alias("_mask"))
    joined = packed.select(id_col, "shard", "bin_id").join(
        ids_df.select(*carry), id_col
    )
    struct_fields = [F.col(id_col).alias("did"), F.col("_ids")]
    if mask_col is not None:
        struct_fields.append(F.col("_mask"))
    grouped = joined.groupBy("shard", "bin_id").agg(
        F.sort_array(
            F.collect_list(F.struct(*struct_fields))
        ).alias("_docs")
    )
    d = F.col("_docs")
    # stage the concatenated/truncated id stream and the segment
    # stream ONCE (multiply-referenced non-cheap subtrees re-inline
    # otherwise — the staged-struct rule)
    stage_cols = {
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
    if mask_col is not None:
        stage_cols["_allmask"] = F.flatten(F.transform(d, lambda x: x["_mask"]))
    staged = grouped.withColumns(stage_cols).withColumns(
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
    if mask_col is None:
        bin_mask = F.concat(
            F.array_repeat(F.lit(1).cast("int"), nreal.cast("int")),
            F.array_repeat(F.lit(0).cast("int"), pad_n),
        )
    else:
        bin_mask = F.concat(
            F.slice(F.col("_allmask"), 1, seq_len),
            F.array_repeat(F.lit(0).cast("int"), pad_n),
        )
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
        bin_mask.alias("loss_mask"),
        F.concat(
            F.slice(F.col("_segs"), 1, seq_len),
            F.array_repeat(F.lit(0).cast("int"), pad_n),
        ).alias("segment_ids"),
    )


def sft_conversation_ids(
    turns: DataFrame,
    merges: list[tuple[str, str]],
    vocab: dict[str, int],
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    content_col: str = "content",
    segments: DataFrame | None = None,
) -> DataFrame:
    """Per-conversation token ids WITH the role-aware loss mask — the
    token-level form of ``chat.chat_loss_mask``'s turn accounting.
    Each turn renders as ``[role_marker] content_ids [EOS]`` (role
    markers are the reserved single ids ``ROLE_IDS``; content is BPE-
    encoded through the production Arrow path with the vocabulary's
    piece ids, which must start at ``N_SFT_SPECIALS`` to avoid marker
    collisions); turns concatenate in ``turn_col`` order.  The mask is
    1 ONLY on assistant content ids and their EOS (the assistant-only
    supervision convention — markers and the prompt side never train),
    0 everywhere else, aligned position-for-position with the ids.

    Output: (conv, token_ids array<int>, loss_mask array<int>,
    n_ids int).  Scale shape: one Arrow encode pass over turn
    contents, one (conv) groupBy with sorted struct collection —
    per-task state is one conversation.

    ``segments``: optional pre-segmented pieces per turn —
    ``(conv_col, turn_col, bpe_tokens_learned)`` — for callers that
    already ran the Arrow BPE segmentation over the same contents
    (e.g. a corpus-wide ``bpe_segment_arrow`` pass whose docs ARE the
    turn contents): the encode then skips its own segmentation pass.
    The pieces must be exactly ``bpe_segment_arrow(content, merges)``
    per turn — segmentation is a pure function of (text, merges), so
    a per-doc table keyed back to (conv, turn) satisfies this by
    construction."""
    from kafkastreamsinteractivequeries_spark.operators.text import (
        bpe_segment_arrow,
    )

    # Surrogate turn key for the single-id-column Arrow encoder.  The
    # arithmetic pack (conv*100000 + turn) silently collides across
    # conversations if turn_idx ever leaves [0, 100000) — guard it with
    # an executor-side raise so malformed input is an error, not
    # cross-conversation content mis-assignment (round-10 ADVICE).
    _turn = F.col(turn_col).cast("long")
    _turn_ok = F.when((_turn >= 0) & (_turn < 100000), _turn).otherwise(
        F.raise_error(
            F.concat(
                F.lit("sft_conversation_ids: turn_idx outside [0, 100000): "),
                _turn.cast("string"),
            )
        ).cast("long")
    )
    base = turns.select(
        (F.col(conv_col).cast("long") * 100000 + _turn_ok)
        .alias("_tk"),
        F.col(conv_col).cast("long").alias("_conv"),
        F.col(turn_col).cast("long").alias("_turn"),
        F.col(role_col).alias("_role"),
        F.col(content_col).alias("text"),
    )
    if segments is None:
        seg = bpe_segment_arrow(
            base.select("_tk", "text"), merges, id_col="_tk"
        )
    else:
        _sturn = F.col(turn_col).cast("long")
        seg = segments.select(
            (F.col(conv_col).cast("long") * 100000 + _sturn).alias("_tk"),
            "bpe_tokens_learned",
        )
    ids = encode_token_ids(seg, vocab, id_col="_tk", append_eos=False)
    role_id = (
        F.when(F.col("_role") == "system", ROLE_IDS["system"])
        .when(F.col("_role") == "user", ROLE_IDS["user"])
        .otherwise(ROLE_IDS["assistant"])
        .cast("int")
    )
    content_ids = F.coalesce(
        F.col("token_ids"), F.array().cast("array<int>")
    )
    per_turn = base.join(ids, "_tk").select(
        "_conv",
        "_turn",
        F.concat(
            F.array(role_id),
            content_ids,
            F.array(F.lit(EOS_ID).cast("int")),
        ).alias("_tids"),
        F.when(
            F.col("_role") == "assistant",
            F.concat(
                F.array(F.lit(0).cast("int")),
                F.array_repeat(F.lit(1).cast("int"), F.size(content_ids)),
                F.array(F.lit(1).cast("int")),
            ),
        )
        .otherwise(
            F.array_repeat(F.lit(0).cast("int"), F.size(content_ids) + 2)
        )
        .alias("_tmask"),
    )
    grouped = per_turn.groupBy("_conv").agg(
        F.sort_array(
            F.collect_list(F.struct("_turn", "_tids", "_tmask"))
        ).alias("_ts")
    )
    t = F.col("_ts")
    return grouped.select(
        F.col("_conv").alias(conv_col),
        F.flatten(F.transform(t, lambda x: x["_tids"])).alias("token_ids"),
        F.flatten(F.transform(t, lambda x: x["_tmask"])).alias("loss_mask"),
    ).withColumn("n_ids", F.size("token_ids").cast("int"))


def sft_training_examples(
    turns: DataFrame,
    merges: list[tuple[str, str]],
    vocab: dict[str, int],
    seq_len: int = 2048,
    shards: int = 32,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    content_col: str = "content",
    segments: DataFrame | None = None,
) -> DataFrame:
    """Tensor-ready SFT shards: ``sft_conversation_ids`` (role-marked
    token ids + assistant-only loss mask) packed WHOLE-CONVERSATION
    into no-straddle ``seq_len`` bins by ``token_training_examples``
    — the final hop from a conversation table to training files,
    with attention boundaries (``segment_ids``) separating packed
    conversations.  Same output schema as ``token_training_examples``
    with ``doc_ids`` = the conversation ids in layout order."""
    convs = sft_conversation_ids(
        turns,
        merges,
        vocab,
        conv_col,
        turn_col,
        role_col,
        content_col,
        segments=segments,
    )
    return token_training_examples(
        convs,
        seq_len=seq_len,
        shards=shards,
        id_col=conv_col,
        ids_col="token_ids",
        mask_col="loss_mask",
    )


def packing_stats(
    bins_df: DataFrame,
    seq_len: int,
) -> DataFrame:
    """Per-shard packing-efficiency datasheet over
    :func:`token_training_examples` output — the QA table a training
    run reads before shipping shards: (shard, n_bins, total_tokens,
    n_truncated, fill_permille, waste_tokens).  ``fill_permille`` is
    exact-integer ``(1000·Σn_tokens) div (seq_len·n_bins)``;
    ``waste_tokens`` the padding total.  One partial-agg pass over the
    bin table (bins-bounded, never corpus-bounded)."""
    return bins_df.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum(F.col("truncated").cast("long")).cast("long").alias("n_truncated"),
        F.expr(
            f"CAST((1000 * sum(n_tokens)) div ({seq_len} * count(1)) AS BIGINT)"
        ).alias("fill_permille"),
        (F.lit(seq_len) * F.count(F.lit(1)) - F.sum("n_tokens"))
        .cast("long")
        .alias("waste_tokens"),
    )

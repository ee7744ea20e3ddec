"""Chat / SFT conversation operators — the data-prep family between a
raw conversation dump and a supervised-fine-tuning batch: parse the
industry-standard ``messages`` JSON (role/content arrays), validate
turn structure, compute the per-turn token offsets and the
assistant-only LOSS MASK, and render deterministic chat templates.

Everything is Spark-first: JSON decode is ``from_json`` (JVM-side, no
Python in the parse path), per-conversation sequences ride bounded
windows or sorted-struct aggregates (a conversation is a bounded
object — tens of turns — so per-conv windows never hit the global-
window skew cliff), and token counts use the repo's whitespace
tokenizer convention (``dedup.tokens_col``), keeping every output an
integer the DuckDB oracle replays exactly.

Scale notes: the parse/mask/render chain is one shuffle on conv_id
(the explode is map-side); loss-mask offsets are per-conv cumsums over
``turn_idx`` windows bounded by conversation length.  At 100 TB the
conv_id shuffle is the only corpus-sized movement, and it is the same
key every downstream packing/training step groups by anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

CHAT_MESSAGE_SCHEMA = "array<struct<role:string,content:string>>"

#: canonical role set (the OpenAI-lineage convention every SFT format
#: shares); anything else fails validation
CHAT_ROLES = ("system", "user", "assistant")

#: fixed per-turn template overhead in whitespace tokens: the start
#: marker, the role tag, and the end marker — the constant the loss
#: mask and packing budgets must both account for
TURN_OVERHEAD_TOKENS = 3


def parse_conversations(
    df: DataFrame, json_col: str = "messages", id_col: str = "conv_id"
) -> DataFrame:
    """``messages`` JSON array → one row per turn: (conv_id, turn_idx,
    role, content).  ``from_json`` with the declared struct schema —
    JVM-side decode, malformed JSON degrades to zero turns for that
    conversation (from_json yields NULL, posexplode drops it), the
    adversarial-input convention."""
    return df.select(
        F.col(id_col).alias("conv_id"),
        F.posexplode(
            F.from_json(F.col(json_col), CHAT_MESSAGE_SCHEMA)
        ).alias("turn_idx", "m"),
    ).select(
        "conv_id",
        "turn_idx",
        F.col("m.role").alias("role"),
        F.col("m.content").alias("content"),
    )


def conversations_to_json(
    turns: DataFrame,
    id_col: str = "conv_id",
) -> DataFrame:
    """Inverse of ``parse_conversations``: turn rows → (conv_id,
    messages JSON string).  Turns are ordered by ``turn_idx`` via a
    sorted-struct aggregate (no window), then serialized with
    ``to_json`` — the exact bytes ``from_json`` round-trips."""
    return (
        turns.groupBy(F.col(id_col).alias("conv_id"))
        .agg(
            F.array_sort(
                F.collect_list(F.struct("turn_idx", "role", "content"))
            ).alias("_t")
        )
        .select(
            "conv_id",
            F.to_json(
                F.transform(
                    F.col("_t"),
                    lambda t: F.struct(
                        t["role"].alias("role"), t["content"].alias("content")
                    ),
                )
            ).alias("messages"),
        )
    )


def validate_conversations(turns: DataFrame) -> DataFrame:
    """Structural validation of parsed turns — the gate before any SFT
    example enters a training mix.  Rules (first violated rule wins,
    checked in this order):

    - ``empty``        — zero turns survive parsing (malformed JSON);
    - ``bad_role``     — a role outside ``CHAT_ROLES``;
    - ``system_pos``   — a system turn anywhere but turn 0;
    - ``alternation``  — after the optional system turn, roles must
      strictly alternate user/assistant starting with user;
    - ``no_assistant`` — the conversation never reaches an assistant
      turn (nothing to learn from);
    - ``empty_turn``   — a NULL/empty content string.

    Output: (conv_id, n_turns, valid int, reason).  One aggregation:
    the role sequence is assembled per conversation with a
    sorted-struct collect (bounded by conversation length), every
    rule is then an array expression over it — no window, no Python.
    """
    seq = turns.groupBy("conv_id").agg(
        F.array_sort(
            F.collect_list(F.struct("turn_idx", "role", "content"))
        ).alias("t")
    )
    roles = F.transform(F.col("t"), lambda x: x["role"])
    n = F.size("t")
    # roles after the optional leading system turn
    body = F.when(
        F.element_at(roles, 1) == "system", F.slice(roles, 2, 1_000_000)
    ).otherwise(roles)
    bad_role = F.exists(
        roles, lambda r: r.isNull() | ~r.isin(*CHAT_ROLES)
    )
    system_pos = F.exists(
        F.transform(
            F.col("t"),
            lambda x: (x["role"] == "system") & (x["turn_idx"] > 0),
        ),
        lambda b: b,
    )
    alternation = F.exists(
        F.transform(
            F.sequence(F.lit(1), F.size(body)),
            lambda i: F.element_at(body, i)
            != F.when(i % 2 == 1, F.lit("user")).otherwise(F.lit("assistant")),
        ),
        lambda b: b,
    )
    no_assistant = ~F.exists(roles, lambda r: r == "assistant")
    empty_turn = F.exists(
        F.col("t"), lambda x: x["content"].isNull() | (x["content"] == "")
    )
    reason = (
        F.when(n == 0, "empty")
        .when(bad_role, "bad_role")
        .when(system_pos, "system_pos")
        .when(alternation, "alternation")
        .when(no_assistant, "no_assistant")
        .when(empty_turn, "empty_turn")
    )
    return seq.select(
        "conv_id",
        n.cast("int").alias("n_turns"),
        F.when(reason.isNull(), 1).otherwise(0).cast("int").alias("valid"),
        F.coalesce(reason, F.lit("ok")).alias("reason"),
    )


def chat_loss_mask(turns: DataFrame) -> DataFrame:
    """Per-turn token accounting for SFT: (conv_id, turn_idx, role,
    n_tokens, start_token, loss_mask) — ``n_tokens`` is the turn's
    packed length (whitespace content tokens + the fixed
    ``TURN_OVERHEAD_TOKENS`` template overhead), ``start_token`` the
    cumulative offset of the turn inside its rendered conversation,
    and ``loss_mask`` 1 exactly on assistant turns (the only spans
    SFT computes loss on).  Integer-exact end to end.

    The cumsum window partitions by conv_id ordered by turn_idx —
    bounded by conversation length, never a corpus-wide frame."""
    from kafkastreamsinteractivequeries_spark.operators.dedup import tokens_col

    n_tok = (
        F.size(tokens_col(F.coalesce(F.col("content"), F.lit(""))))
        + F.lit(TURN_OVERHEAD_TOKENS)
    ).cast("long")
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return turns.select(
        "conv_id",
        "turn_idx",
        "role",
        n_tok.alias("n_tokens"),
        F.coalesce(F.sum(n_tok).over(w), F.lit(0)).cast("long").alias(
            "start_token"
        ),
        F.when(F.col("role") == "assistant", 1)
        .otherwise(0)
        .cast("int")
        .alias("loss_mask"),
    )


def render_chat_template(
    turns: DataFrame,
    start_marker: str = "<|im_start|>",
    end_marker: str = "<|im_end|>",
) -> DataFrame:
    """Deterministic ChatML-style rendering: each turn becomes
    ``{start}{role}\\n{content}{end}\\n``, concatenated in turn order —
    (conv_id, text, n_turns).  Sorted-struct aggregate + one
    ``aggregate`` fold; no window, no Python.  The rendered text is
    what packing operators (``pack_sequences_no_straddle``) budget
    with ``chat_loss_mask``'s token counts."""
    return (
        turns.groupBy("conv_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("turn_idx", "role", "content"))
            ).alias("t")
        )
        .select(
            "conv_id",
            F.aggregate(
                F.col("t"),
                F.lit("").cast("string"),
                lambda acc, x: F.concat(
                    acc,
                    F.lit(start_marker),
                    x["role"],
                    F.lit("\n"),
                    F.coalesce(x["content"], F.lit("")),
                    F.lit(end_marker),
                    F.lit("\n"),
                ),
            ).alias("text"),
            F.size("t").cast("int").alias("n_turns"),
        )
    )


def pack_conversations(
    turns: DataFrame, seq_len: int = 2048, shards: int = 32
) -> DataFrame:
    """Contamination-free SFT batch layout: each CONVERSATION lands
    whole in one bin (a conversation split across bins would train on
    a truncated exchange), packed by its full rendered length —
    Σ per-turn (content tokens + ``TURN_OVERHEAD_TOKENS``), the same
    accounting ``chat_loss_mask`` reports, so mask offsets computed
    there are valid inside the packed bin at ``bin_offset +
    start_token``.  Composition: one aggregation to per-conv lengths,
    then the no-straddle next-fit packer over the precomputed
    lengths (``curation.pack_sequences_no_straddle(n_tokens_col=…)``
    — deterministic shards, Arrow shard-local fill).  Output:
    (conv_id, n_tokens, shard, bin_id, offset_in_bin, oversize)."""
    from kafkastreamsinteractivequeries_spark.operators.curation import (
        pack_sequences_no_straddle,
    )

    lengths = chat_loss_mask(turns).groupBy("conv_id").agg(
        F.sum("n_tokens").cast("long").alias("n_tokens")
    )
    return pack_sequences_no_straddle(
        lengths,
        seq_len=seq_len,
        shards=shards,
        id_col="conv_id",
        n_tokens_col="n_tokens",
    )

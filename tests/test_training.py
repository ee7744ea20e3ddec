"""Unit tests for operators/training.py — the token-ID
training-example emitter (vocab ids → encode → no-straddle bins →
loss mask / segment ids), including the detokenize round trip."""

from pyspark.sql import functions as F

from kafkastreamsinteractivequeries_spark.operators.text import (
    bpe_segment_arrow,
    bpe_train_trajectory,
)
from kafkastreamsinteractivequeries_spark.operators.training import (
    EOS_ID,
    N_SPECIALS,
    PAD_ID,
    UNK_ID,
    encode_token_ids,
    token_id_vocab,
    token_training_examples,
)

ROWS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log and the cat sat too"),
    (2, "a cat and a dog and a log"),
    (3, "the the the the the the the the the the the the"),  # long-ish
    (4, None),  # NULL text degrades, never crashes
    (5, "cat"),
]


def _fixture(spark):
    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    traj = bpe_train_trajectory(docs, num_merges=4)
    merges = [(left, right) for _s, left, right, _n in traj]
    seg = bpe_segment_arrow(docs, merges)
    vocab_df = token_id_vocab(seg)
    vocab = {r["piece"]: r["token_id"] for r in vocab_df.collect()}
    ids = encode_token_ids(seg, vocab)
    return docs, seg, vocab_df, vocab, ids


def test_vocab_ids_and_encode(spark):
    docs, seg, vocab_df, vocab, ids = _fixture(spark)
    rows = vocab_df.collect()
    # frequency-ranked total order, ids contiguous from N_SPECIALS
    ordered = sorted(rows, key=lambda r: (-r["count"], r["piece"]))
    assert [r["token_id"] for r in ordered] == list(
        range(N_SPECIALS, N_SPECIALS + len(rows))
    )
    assert min(vocab.values()) == N_SPECIALS  # specials never collide
    seg_map = {r["doc_id"]: r["bpe_tokens_learned"] for r in seg.collect()}
    for r in ids.collect():
        pieces = seg_map[r["doc_id"]]
        if pieces is None:
            assert r["token_ids"] is None and r["n_ids"] is None
            continue
        expect = [vocab.get(p, UNK_ID) for p in pieces] + [EOS_ID]
        assert list(r["token_ids"]) == expect
        assert r["n_ids"] == len(expect)


def test_training_examples_layout_and_roundtrip(spark):
    docs, seg, vocab_df, vocab, ids = _fixture(spark)
    ids = ids.filter(F.col("token_ids").isNotNull())
    seq_len = 24
    out = token_training_examples(ids, seq_len=seq_len, shards=2).collect()
    inv = {v: k for k, v in vocab.items()}
    seg_map = {r["doc_id"]: r["bpe_tokens_learned"] for r in seg.collect()}
    seen_docs = []
    for b in out:
        assert len(b["input_ids"]) == seq_len
        assert len(b["loss_mask"]) == seq_len
        assert len(b["segment_ids"]) == seq_len
        # mask ⟷ padding agreement, segment boundary agreement
        for pos in range(seq_len):
            real = pos < b["n_tokens"]
            assert b["loss_mask"][pos] == (1 if real else 0)
            assert (b["segment_ids"][pos] > 0) == real
            if not real:
                assert b["input_ids"][pos] == PAD_ID
        # detokenize round trip: split the real ids at EOS back into
        # documents and invert the vocab — must recover each doc's
        # piece sequence exactly (truncated bins check the prefix)
        real_ids = b["input_ids"][: b["n_tokens"]]
        doc_ids = list(b["doc_ids"])
        seen_docs.extend(doc_ids)
        chunks, cur = [], []
        for t in real_ids:
            if t == EOS_ID:
                chunks.append(cur)
                cur = []
            else:
                cur.append(t)
        if cur:  # truncated tail (no EOS) — oversize bins only
            assert b["truncated"]
            chunks.append(cur)
        assert len(chunks) == len(doc_ids) == b["n_docs"]
        for did, chunk in zip(doc_ids, chunks):
            pieces = [inv[t] for t in chunk]
            expect = seg_map[did]
            if b["truncated"]:
                assert pieces == expect[: len(pieces)]
            else:
                assert pieces == expect
        # segment ids are the 1-based doc index, in layout order
        boundaries = [b["segment_ids"][0]] + [
            b["segment_ids"][i]
            for i in range(1, b["n_tokens"])
            if b["segment_ids"][i] != b["segment_ids"][i - 1]
        ]
        assert boundaries == list(range(1, len(doc_ids) + 1))
    # every non-null doc landed in exactly one bin
    assert sorted(seen_docs) == [0, 1, 2, 3, 5]
    # doc 3 segments long (12 'the's → >24 ids?) — at least assert any
    # oversize bin is alone in its bin
    for b in out:
        if b["truncated"]:
            assert b["n_docs"] == 1 and b["n_tokens"] == seq_len


def test_training_examples_partitioning_invariant(spark):
    docs, seg, vocab_df, vocab, ids = _fixture(spark)
    ids = ids.filter(F.col("token_ids").isNotNull())
    a = {
        (r["shard"], r["bin_id"]): (list(r["input_ids"]), list(r["segment_ids"]))
        for r in token_training_examples(ids, seq_len=24, shards=2).collect()
    }
    b = {
        (r["shard"], r["bin_id"]): (list(r["input_ids"]), list(r["segment_ids"]))
        for r in token_training_examples(
            ids.repartition(7), seq_len=24, shards=2
        ).collect()
    }
    assert a == b


def test_sft_training_examples_role_mask(spark):
    """SFT shard emitter: each turn renders [role_marker] content [EOS],
    the loss mask is 1 exactly on assistant content+EOS, conversations
    pack whole, and the mask stays position-aligned through packing."""
    from kafkastreamsinteractivequeries_spark.operators.training import (
        N_SFT_SPECIALS,
        ROLE_IDS,
        sft_conversation_ids,
        sft_training_examples,
        token_id_vocab,
    )

    turns = spark.createDataFrame(
        [
            (1, 0, "system", "be helpful"),
            (1, 1, "user", "the cat sat"),
            (1, 2, "assistant", "on the mat"),
            (2, 0, "system", "be helpful"),
            (2, 1, "user", "a dog"),
            (2, 2, "assistant", "a log and a cat"),
        ],
        "conv_id long, turn_idx int, role string, content string",
    )
    traj = bpe_train_trajectory(
        turns.select(F.col("conv_id").alias("doc_id"), F.col("content").alias("text")),
        num_merges=3,
    )
    merges = [(left, right) for _s, left, right, _n in traj]
    seg_all = bpe_segment_arrow(
        turns.select(
            (F.col("conv_id") * 100000 + F.col("turn_idx")).alias("doc_id"),
            F.col("content").alias("text"),
        ),
        merges,
    )
    vocab_df = token_id_vocab(seg_all, first_id=N_SFT_SPECIALS)
    vocab = {r["piece"]: r["token_id"] for r in vocab_df.collect()}
    assert min(vocab.values()) == N_SFT_SPECIALS  # role ids reserved

    convs = {r["conv_id"]: r for r in sft_conversation_ids(turns, merges, vocab).collect()}
    seg_map = {r["doc_id"]: r["bpe_tokens_learned"] for r in seg_all.collect()}
    role_by_turn = {0: "system", 1: "user", 2: "assistant"}
    for cid in (1, 2):
        exp_ids, exp_mask = [], []
        for t in (0, 1, 2):
            content = [vocab[p] for p in seg_map[cid * 100000 + t]]
            role = role_by_turn[t]
            exp_ids += [ROLE_IDS[role]] + content + [3]
            if role == "assistant":
                exp_mask += [0] + [1] * len(content) + [1]
            else:
                exp_mask += [0] * (len(content) + 2)
        assert list(convs[cid]["token_ids"]) == exp_ids, cid
        assert list(convs[cid]["loss_mask"]) == exp_mask, cid
        assert convs[cid]["n_ids"] == len(exp_ids)

    seq_len = 64
    bins = sft_training_examples(turns, merges, vocab, seq_len=seq_len, shards=2).collect()
    seen = []
    for b in bins:
        assert len(b["input_ids"]) == seq_len == len(b["loss_mask"])
        seen.extend(b["doc_ids"])
        # reconstruct each packed conversation's slice and check the
        # mask rides along position-for-position
        pos = 0
        for cid in b["doc_ids"]:
            n = convs[cid]["n_ids"]
            assert list(b["input_ids"][pos : pos + n]) == list(convs[cid]["token_ids"])
            assert list(b["loss_mask"][pos : pos + n]) == list(convs[cid]["loss_mask"])
            pos += n
        # padding is unmasked
        assert all(m == 0 for m in b["loss_mask"][b["n_tokens"]:])
    assert sorted(seen) == [1, 2]
    # assistant supervision exists and prompt side never trains
    total_ones = sum(sum(b["loss_mask"]) for b in bins)
    assert total_ones == sum(sum(convs[c]["loss_mask"]) for c in (1, 2)) > 0


def test_sft_conversation_ids_turn_idx_guard(spark):
    """turn_idx outside [0, 100000) must raise, not silently collide
    the arithmetic surrogate key across conversations."""
    import pytest
    from kafkastreamsinteractivequeries_spark.operators.training import (
        sft_conversation_ids,
    )

    bad = spark.createDataFrame(
        [(1, 100000, "user", "overflow turn"), (1, 0, "assistant", "ok")],
        "conv_id long, turn_idx int, role string, content string",
    )
    with pytest.raises(Exception, match="turn_idx outside"):
        sft_conversation_ids(bad, [], {"o": 10}).collect()

    neg = spark.createDataFrame(
        [(1, -1, "user", "negative turn")],
        "conv_id long, turn_idx int, role string, content string",
    )
    with pytest.raises(Exception, match="turn_idx outside"):
        sft_conversation_ids(neg, [], {"o": 10}).collect()


def test_packing_stats_datasheet(spark):
    """packing_stats aggregates the bin table exactly: bins, tokens,
    truncation count, integer fill permille, waste."""
    from kafkastreamsinteractivequeries_spark.operators.training import (
        packing_stats,
    )

    docs, seg, vocab_df, vocab, ids = _fixture(spark)
    ids = ids.filter(F.col("token_ids").isNotNull())
    seq_len = 24
    bins = token_training_examples(ids, seq_len=seq_len, shards=2)
    rows = bins.collect()
    stats = {r["shard"]: r for r in packing_stats(bins, seq_len).collect()}
    for shard in {r["shard"] for r in rows}:
        mine = [r for r in rows if r["shard"] == shard]
        s = stats[shard]
        assert s["n_bins"] == len(mine)
        tot = sum(r["n_tokens"] for r in mine)
        assert s["total_tokens"] == tot
        assert s["n_truncated"] == sum(1 for r in mine if r["truncated"])
        assert s["fill_permille"] == (1000 * tot) // (seq_len * len(mine))
        assert s["waste_tokens"] == seq_len * len(mine) - tot


def test_sft_convs_shift_matches_operator(spark):
    """The x11 'sftbin' derivation: per-conversation token ids built
    by ARITHMETIC SHIFT of the base-vocab corpus encode (vmap7[p] ==
    vmap[p] + N_SFT_SPECIALS - N_SPECIALS, UNK unchanged, trailing
    EOS stripped, roles from the sorted-turn index) must equal
    sft_conversation_ids run the operator way with the first_id=7
    vocabulary over the same turns."""
    from kafkastreamsinteractivequeries_spark.operators.training import (
        N_SFT_SPECIALS,
        ROLE_IDS,
        sft_conversation_ids,
    )

    docs, seg, vocab_df, vocab, ids = _fixture(spark)
    nonempty_ids = ids.filter(F.col("token_ids").isNotNull())
    vocab7_df = token_id_vocab(seg, first_id=N_SFT_SPECIALS)
    vocab7 = {r["piece"]: r["token_id"] for r in vocab7_df.collect()}
    # the ranking identity the shift relies on
    assert vocab7 == {
        p: i + (N_SFT_SPECIALS - N_SPECIALS) for p, i in vocab.items()
    }

    # operator path: conv = doc_id div 2, turns in doc_id order
    turns = (
        docs.filter(F.col("text").isNotNull())
        .selectExpr("doc_id div 2 as conv_id", "doc_id", "text as content")
        .withColumn(
            "turn_idx",
            F.row_number().over(
                __import__("pyspark").sql.Window.partitionBy(
                    "conv_id"
                ).orderBy("doc_id")
            )
            - 1,
        )
        .withColumn(
            "role",
            F.when(F.col("turn_idx") == 0, "system")
            .when(F.col("turn_idx") % 2 == 1, "user")
            .otherwise("assistant"),
        )
    )
    traj = bpe_train_trajectory(docs, num_merges=4)
    merges = [(left, right) for _s, left, right, _n in traj]
    expected = {
        r["conv_id"]: r
        for r in sft_conversation_ids(turns, merges, vocab7).collect()
    }

    # shift path (the x11 entry derivation)
    shift = N_SFT_SPECIALS - N_SPECIALS
    cids = F.transform(
        F.slice(F.col("token_ids"), 1, F.col("n_ids") - 1),
        lambda x: F.when(x == UNK_ID, x).otherwise(x + shift).cast("int"),
    )
    eos7 = F.array(F.lit(EOS_ID).cast("int"))
    srt = (
        nonempty_ids.selectExpr("doc_id div 2 as conv_id", "doc_id", "token_ids", "n_ids")
        .select("conv_id", "doc_id", cids.alias("_cids"))
        .groupBy("conv_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("doc_id", "_cids"))
            ).alias("_ts")
        )
    )
    t = F.col("_ts")

    def role_id(j):
        return (
            F.when(j == 0, ROLE_IDS["system"])
            .when(j % 2 == 1, ROLE_IDS["user"])
            .otherwise(ROLE_IDS["assistant"])
            .cast("int")
        )

    got = {
        r["conv_id"]: r
        for r in srt.select(
            "conv_id",
            F.flatten(
                F.transform(
                    t,
                    lambda x, j: F.concat(
                        F.array(role_id(j)), x["_cids"], eos7
                    ),
                )
            ).alias("token_ids"),
            F.flatten(
                F.transform(
                    t,
                    lambda x, j: F.when(
                        (j > 0) & (j % 2 == 0),
                        F.concat(
                            F.array(F.lit(0).cast("int")),
                            F.array_repeat(
                                F.lit(1).cast("int"), F.size(x["_cids"])
                            ),
                            F.array(F.lit(1).cast("int")),
                        ),
                    ).otherwise(
                        F.array_repeat(
                            F.lit(0).cast("int"), F.size(x["_cids"]) + 2
                        )
                    ),
                )
            ).alias("loss_mask"),
        )
        .withColumn("n_ids", F.size("token_ids").cast("int"))
        .collect()
    }

    assert set(got) == set(expected)
    for c in got:
        assert list(got[c]["token_ids"]) == list(expected[c]["token_ids"])
        assert list(got[c]["loss_mask"]) == list(expected[c]["loss_mask"])
        assert got[c]["n_ids"] == expected[c]["n_ids"]

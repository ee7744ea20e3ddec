"""Unit tests for operators/chat.py (SFT conversation prep)."""

import json

from pyspark.sql import functions as F

from kafkastreamsinteractivequeries_spark.operators.chat import (
    TURN_OVERHEAD_TOKENS,
    chat_loss_mask,
    conversations_to_json,
    parse_conversations,
    render_chat_template,
    validate_conversations,
)


def _conv(spark, msgs, conv_id=1):
    return spark.createDataFrame(
        [(conv_id, json.dumps(msgs))], "conv_id long, messages string"
    )


GOOD = [
    {"role": "system", "content": "be helpful"},
    {"role": "user", "content": "two plus two"},
    {"role": "assistant", "content": "it is four"},
    {"role": "user", "content": "thanks"},
    {"role": "assistant", "content": "any time"},
]


def test_parse_and_json_round_trip(spark):
    turns = parse_conversations(_conv(spark, GOOD))
    rows = sorted(
        (r["turn_idx"], r["role"], r["content"]) for r in turns.collect()
    )
    assert rows == [
        (i, m["role"], m["content"]) for i, m in enumerate(GOOD)
    ]
    # inverse: to_json bytes re-parse to the identical turn rows
    back = parse_conversations(conversations_to_json(turns))
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, turns.collect())
    )
    # malformed JSON degrades to zero turns, never errors
    bad = spark.createDataFrame(
        [(9, "{not json"), (10, None)], "conv_id long, messages string"
    )
    assert parse_conversations(bad).count() == 0


def test_validate_conversations(spark):
    cases = {
        1: (GOOD, 1, "ok"),
        2: ([{"role": "user", "content": "q"},
             {"role": "assistant", "content": "a"}], 1, "ok"),
        3: ([{"role": "tool", "content": "x"}], 0, "bad_role"),
        4: ([{"role": "user", "content": "q"},
             {"role": "system", "content": "late"}], 0, "system_pos"),
        5: ([{"role": "user", "content": "q"},
             {"role": "user", "content": "q2"}], 0, "alternation"),
        6: ([{"role": "assistant", "content": "a"}], 0, "alternation"),
        7: ([{"role": "system", "content": "s"},
             {"role": "user", "content": "q"}], 0, "no_assistant"),
        8: ([{"role": "user", "content": ""},
             {"role": "assistant", "content": "a"}], 0, "empty_turn"),
    }
    df = spark.createDataFrame(
        [(cid, json.dumps(msgs)) for cid, (msgs, _v, _r) in cases.items()],
        "conv_id long, messages string",
    )
    got = {
        r["conv_id"]: (r["valid"], r["reason"])
        for r in validate_conversations(parse_conversations(df)).collect()
    }
    for cid, (_msgs, v, reason) in cases.items():
        assert got[cid] == (v, reason), (cid, got[cid])


def test_chat_loss_mask_offsets(spark):
    turns = parse_conversations(_conv(spark, GOOD))
    out = {
        r["turn_idx"]: r for r in chat_loss_mask(turns).collect()
    }
    # n_tokens = whitespace tokens + overhead
    lens = [len(m["content"].split()) + TURN_OVERHEAD_TOKENS for m in GOOD]
    starts = [sum(lens[:i]) for i in range(len(lens))]
    for i in range(len(GOOD)):
        assert out[i]["n_tokens"] == lens[i]
        assert out[i]["start_token"] == starts[i]
        assert out[i]["loss_mask"] == (
            1 if GOOD[i]["role"] == "assistant" else 0
        )
    # masked fraction = assistant tokens / total
    masked = sum(lens[i] for i in (2, 4))
    assert masked == sum(
        r["n_tokens"] for r in out.values() if r["loss_mask"] == 1
    )


def test_render_chat_template(spark):
    turns = parse_conversations(_conv(spark, GOOD[:3]))
    row = render_chat_template(turns).collect()[0]
    assert row["n_turns"] == 3
    assert row["text"] == (
        "<|im_start|>system\nbe helpful<|im_end|>\n"
        "<|im_start|>user\ntwo plus two<|im_end|>\n"
        "<|im_start|>assistant\nit is four<|im_end|>\n"
    )
    # partitioning invariance of the whole chain
    many = spark.createDataFrame(
        [(i, json.dumps(GOOD)) for i in range(40)],
        "conv_id long, messages string",
    )
    a = sorted(map(tuple, render_chat_template(parse_conversations(many)).collect()))
    b = sorted(
        map(
            tuple,
            render_chat_template(
                parse_conversations(many.repartition(7))
            ).collect(),
        )
    )
    assert a == b


def test_pack_conversations_no_straddle(spark):
    """Conversations pack WHOLE: every conv's bin consumption equals
    its chat_loss_mask total, bins never exceed seq_len (except
    oversize-alone convs), and offsets are the running fill."""
    import json

    from kafkastreamsinteractivequeries_spark.operators.chat import (
        chat_loss_mask,
        pack_conversations,
        parse_conversations,
    )

    convs = []
    for cid in range(20):
        msgs = [
            {"role": "user", "content": " ".join(["q"] * (3 + cid % 5))},
            {"role": "assistant", "content": " ".join(["a"] * (4 + cid % 7))},
        ]
        if cid == 7:  # oversize conversation
            msgs.append({"role": "user", "content": " ".join(["x"] * 300)})
            msgs.append({"role": "assistant", "content": "ok"})
        convs.append((cid, json.dumps(msgs)))
    turns = parse_conversations(
        spark.createDataFrame(convs, "conv_id long, messages string")
    )
    lengths = {
        r["conv_id"]: r["tot"]
        for r in chat_loss_mask(turns)
        .groupBy("conv_id")
        .agg(F.sum("n_tokens").alias("tot"))
        .collect()
    }
    packed = {r["conv_id"]: r for r in pack_conversations(turns, seq_len=64, shards=4).collect()}
    assert set(packed) == set(lengths)
    for cid, r in packed.items():
        assert r["n_tokens"] == lengths[cid]
        assert r["oversize"] == (lengths[cid] > 64), cid
    # per (shard, bin): fill never exceeds seq_len unless a single
    # oversize conv owns the bin; offsets are the running fill
    bins = {}
    for r in packed.values():
        bins.setdefault((r["shard"], r["bin_id"]), []).append(r)
    for (sh, b), rows in bins.items():
        rows.sort(key=lambda r: r["offset_in_bin"])
        fill = 0
        for r in rows:
            assert r["offset_in_bin"] == fill
            fill += r["n_tokens"]
        assert fill <= 64 or (len(rows) == 1 and rows[0]["oversize"])

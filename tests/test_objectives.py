"""Unit tests for operators/objectives.py (FIM + span corruption)."""

import hashlib

from pyspark.sql import functions as F

from kafkastreamsinteractivequeries_spark.operators.objectives import (
    FIM_MIDDLE,
    FIM_PREFIX,
    FIM_SUFFIX,
    fim_transform,
    span_corruption,
)


def _m6(*parts) -> int:
    return int(hashlib.md5("|".join(parts).encode()).hexdigest()[:6], 16)


def test_fim_transform_replay_and_losslessness(spark):
    """FIM cuts replay from the md5 formulas; rendered text is a
    lossless re-ordering (token multiset preserved); rate 1000 FIMs
    everything, rate 0 nothing; partitioning-invariant."""
    rows = [(i, " ".join(f"w{j}" for j in range(10 + i % 5))) for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in fim_transform(docs, rate_permille=1000).collect()}
    for i, text in rows:
        toks = text.split()
        n = len(toks)
        c1, c2 = _m6(str(i), "a") % (n + 1), _m6(str(i), "b") % (n + 1)
        lo, hi = min(c1, c2), max(c1, c2)
        spm = _m6(str(i), "m") % 2 == 1
        r = out[i]
        assert (r["prefix_tokens"], r["middle_tokens"], r["suffix_tokens"]) == (
            lo, hi - lo, n - hi,
        ), i
        p, m, s = (
            " ".join(toks[:lo]), " ".join(toks[lo:hi]), " ".join(toks[hi:]),
        )
        expect = (
            FIM_SUFFIX + s + FIM_PREFIX + p + FIM_MIDDLE + m
            if spm
            else FIM_PREFIX + p + FIM_SUFFIX + s + FIM_MIDDLE + m
        )
        assert r["rendered"] == expect, i
        assert r["mode"] == ("spm" if spm else "psm")
        # lossless: stripping sentinels recovers the token multiset
        body = (
            r["rendered"]
            .replace(FIM_PREFIX, " ")
            .replace(FIM_MIDDLE, " ")
            .replace(FIM_SUFFIX, " ")
        )
        assert sorted(body.split()) == sorted(toks), i
    # rate 0: everything plain and untouched
    plain = fim_transform(docs, rate_permille=0).collect()
    assert all(r["mode"] == "plain" and r["rendered"] == dict(rows)[r["doc_id"]]
               for r in plain)
    # partitioning invariance
    again = {
        r["doc_id"]: r["rendered"]
        for r in fim_transform(docs.repartition(7), rate_permille=1000).collect()
    }
    assert again == {k: v["rendered"] for k, v in out.items()}


def test_span_corruption_t5_convention(spark):
    """Span corruption: spans replay from the md5 grid, input/target
    follow the T5 sentinel convention, sentinel counts agree, tail
    spans truncate, and zero-span docs pass through unchanged."""
    rows = [(i, " ".join(f"t{j}" for j in range(25))) for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in span_corruption(docs).collect()}
    hit_some = False
    for i, text in rows:
        toks = text.split()
        n = len(toks)
        starts = [
            p for p in range(1, n + 1)
            if p % 3 == 1 and _m6(str(i), "s", str(p)) % 7 == 0
        ]
        r = out[i]
        assert r["n_spans"] == len(starts), i
        exp_input, k, pos = [], 0, 1
        while pos <= n:
            if pos in starts:
                k += 1
                exp_input.append(f"<extra_id_{k}>")
                pos += 3
            else:
                exp_input.append(toks[pos - 1])
                pos += 1
        # engine builds input positionally (skips in-span positions)
        assert r["input"] == " ".join(exp_input), i
        exp_target = []
        for k, s in enumerate(starts, start=1):
            exp_target.append(f"<extra_id_{k}>")
            exp_target.extend(toks[s - 1 : s - 1 + 3])
        assert r["target"] == " ".join(exp_target), i
        assert r["corrupted_tokens"] == sum(min(3, n - s + 1) for s in starts)
        if starts:
            hit_some = True
        else:
            assert r["input"] == text
    assert hit_some  # the grid actually fires on this corpus
    # partitioning invariance
    again = {
        r["doc_id"]: (r["input"], r["target"])
        for r in span_corruption(docs.repartition(5)).collect()
    }
    assert again == {k: (v["input"], v["target"]) for k, v in out.items()}


def test_span_corruption_long_document_linear_time(spark):
    """The segment-wise rendering is O(n + n_spans): a 60k-token
    document (≈1.7e8 lambda evals under the old per-position
    O(n·n_spans) scan) must render in seconds, and the output must
    still replay the md5 grid exactly."""
    import time

    n = 60_000
    text = " ".join(f"t{j}" for j in range(n))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    t0 = time.monotonic()
    r = span_corruption(docs).collect()[0]
    wall = time.monotonic() - t0
    assert wall < 60, f"long-doc span corruption took {wall:.1f}s"
    starts = [
        p for p in range(1, n + 1)
        if p % 3 == 1 and _m6("1", "s", str(p)) % 7 == 0
    ]
    assert r["n_spans"] == len(starts) > 1000
    toks = text.split()
    exp_input, k, pos = [], 0, 1
    while pos <= n:
        if pos in set(starts):
            k += 1
            exp_input.append(f"<extra_id_{k}>")
            pos += 3
        else:
            exp_input.append(toks[pos - 1])
            pos += 1
    assert r["input"] == " ".join(exp_input)


def test_token_id_objective_forms_match_string_forms(spark):
    """The id-granularity FIM/span transforms make the SAME draws as
    the string forms (keyed by doc id), so transforming a document as
    ids or as text yields structurally identical cuts/spans — and the
    rendered id sequences carry sentinel IDS where the strings carry
    markers."""
    from kafkastreamsinteractivequeries_spark.operators.objectives import (
        EXTRA_ID_BASE,
        FIM_MIDDLE_ID,
        FIM_PREFIX_ID,
        FIM_SUFFIX_ID,
        fim_token_ids,
        fim_transform,
        span_corruption,
        span_corruption_ids,
    )

    rows = [(i, " ".join(f"w{j}" for j in range(12 + i % 7))) for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # ids: token j of doc i gets id 1000 + j (identity-decodable)
    ids_df = docs.select(
        "doc_id",
        F.transform(
            F.split("text", " "), lambda _x, j: (j + 1000).cast("int")
        ).alias("token_ids"),
    )
    sf = {r["doc_id"]: r for r in fim_transform(docs, rate_permille=700).collect()}
    fi = {r["doc_id"]: r for r in fim_token_ids(ids_df, rate_permille=700).collect()}
    for i, text in rows:
        a, b = sf[i], fi[i]
        assert (a["mode"], a["n_tokens"], a["prefix_tokens"],
                a["middle_tokens"], a["suffix_tokens"]) == (
            b["mode"], b["n_tokens"], b["prefix_tokens"],
            b["middle_tokens"], b["suffix_tokens"]), i
        r = list(b["rendered_ids"])
        n = a["n_tokens"]
        if a["mode"] == "plain":
            assert r == [1000 + j for j in range(n)]
        else:
            assert len(r) == n + 3
            assert sorted(
                x for x in r
                if x not in (FIM_PREFIX_ID, FIM_SUFFIX_ID, FIM_MIDDLE_ID)
            ) == [1000 + j for j in range(n)]
            lo, mid = a["prefix_tokens"], a["middle_tokens"]
            if a["mode"] == "psm":
                assert r[0] == FIM_PREFIX_ID
                assert r[1 : 1 + lo] == [1000 + j for j in range(lo)]
                assert r[1 + lo] == FIM_SUFFIX_ID
            else:
                assert r[0] == FIM_SUFFIX_ID
            assert r[-(mid + 1)] == FIM_MIDDLE_ID
            assert r[-mid:] == [1000 + lo + j for j in range(mid)] if mid else True

    ss = {r["doc_id"]: r for r in span_corruption(docs).collect()}
    si = {r["doc_id"]: r for r in span_corruption_ids(ids_df).collect()}
    hit = False
    for i, _text in rows:
        a, b = ss[i], si[i]
        assert (a["n_spans"], a["corrupted_tokens"], a["n_tokens"]) == (
            b["n_spans"], b["corrupted_tokens"], b["n_tokens"]), i
        inp, tgt = list(b["input_ids"]), list(b["target_ids"])
        if a["n_spans"] == 0:
            assert inp == [1000 + j for j in range(a["n_tokens"])] and tgt == []
            continue
        hit = True
        # sentinels number 1..k in order, in both input and target
        in_sent = [x - EXTRA_ID_BASE for x in inp if EXTRA_ID_BASE < x < 1000]
        tg_sent = [x - EXTRA_ID_BASE for x in tgt if EXTRA_ID_BASE < x < 1000]
        assert in_sent == list(range(1, a["n_spans"] + 1)) == tg_sent
        # input keeps exactly the uncorrupted ids; target spells the rest
        kept = [x for x in inp if x >= 1000]
        spelled = [x for x in tgt if x >= 1000]
        assert len(spelled) == a["corrupted_tokens"]
        assert sorted(kept + spelled) == [
            1000 + j for j in range(a["n_tokens"])
        ]
    assert hit

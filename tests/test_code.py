"""Unit tests for operators/code.py — license detection, comment
stripping with string protection, identifier normalization, function
chunking, and clone detection at both exact and near-miss tiers."""

import pytest
from pyspark.sql import functions as F

from kafkastreamsinteractivequeries_spark.operators.code import (
    code_clone_groups,
    code_clone_near_duplicates,
    function_chunks,
    normalized_code_col,
    spdx_license_headers,
    strip_code_comments,
    stripped_code_col,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_strip_preserves_strings_and_removes_comments(spark):
    src = 's = "a // not a comment"; // trail\n/* block\n multi */\nx = 1 # tail\n'
    out = strip_code_comments(_df(spark, [(1, src)])).collect()[0]
    assert out["stripped_text"] == 's = "a // not a comment"; \n\nx = 1 \n'
    assert out["n_stripped_chars"] == len(src) - len(out["stripped_text"])


def test_strip_handles_escaped_quote_in_string(spark):
    src = 't = "she said \\"hi\\" // ok"; // gone\n'
    out = strip_code_comments(_df(spark, [(1, src)])).collect()[0]
    assert out["stripped_text"] == 't = "she said \\"hi\\" // ok"; \n'


def test_normalize_collapses_renamed_clone(spark):
    a = "def foo(x):\n    y1 = 42 \n    return y1 + x\n"
    b = "def barbar(qq):\n    zz = 7 \n    return zz + qq\n"
    rows = (
        _df(spark, [(1, a), (2, b)])
        .select(normalized_code_col(F.col("text")).alias("n"))
        .collect()
    )
    assert rows[0]["n"] == rows[1]["n"] == (
        "def ID(ID):\n    ID = N \n    return ID + ID\n"
    )


def test_normalize_preserves_keywords_and_strings(spark):
    src = 'if x > 3.14:\n    return "lit // str"\nwhile 0:\n    continue\n'
    n = (
        _df(spark, [(1, src)])
        .select(normalized_code_col(F.col("text")).alias("n"))
        .collect()[0]["n"]
    )
    assert n == "if ID > N:\n    return S\nwhile N:\n    continue\n"


def test_spdx_tag_and_phrase_fallback(spark):
    rows = spdx_license_headers(
        _df(
            spark,
            [
                (1, "// SPDX-License-Identifier: MIT\ncode()\n"),
                (2, "# SPDX-License-Identifier: Apache-2.0\ncode()\n"),
                (3, "/* Permission is hereby granted, free of charge */\n"),
                (4, "// (c) 2026 Example Corp\ncode()\n"),
                (5, "// SPDX-License-Identifier: GPL-3.0-or-later\n"),
                (6, "// SPDX-License-Identifier: EUPL-1.2\n"),
            ],
        )
    ).collect()
    got = {r["doc_id"]: (r["spdx_id"], r["license_family"], r["has_license"]) for r in rows}
    assert got[1] == ("MIT", "mit", 1)
    assert got[2] == ("Apache-2.0", "apache", 1)
    assert got[3] == ("", "mit", 1)  # phrase fallback
    assert got[4] == ("", "none", 0)
    assert got[5] == ("GPL-3.0-or-later", "gpl", 1)
    assert got[6] == ("EUPL-1.2", "other", 1)


def test_function_chunks_drops_preamble_and_indexes(spark):
    src = "// header\ndef a(x):\n    return x\ndef b(y):\n    return y\n"
    rows = function_chunks(_df(spark, [(1, src)])).collect()
    assert [(r["fn_idx"], r["chunk"]) for r in sorted(rows, key=lambda r: r["fn_idx"])] == [
        (0, "def a(x):\n    return x\n"),
        (1, "def b(y):\n    return y\n"),
    ]
    # marker at file start (no preceding newline)
    rows2 = function_chunks(_df(spark, [(2, "def c(z):\n    return z\n")])).collect()
    assert rows2[0]["fn_idx"] == 0 and rows2[0]["chunk"].startswith("def c")


def test_code_clone_groups_collapse(spark):
    a = "def foo(x):\n    return x + 1\n"
    b = "def bar(y):\n    return y + 2\n"  # type-2 clone of a
    c = "def baz(z):\n    if z:\n        return z\n    return 0\n"  # different
    g = code_clone_groups(_df(spark, [(1, a), (2, b), (3, c)])).collect()
    by_keep = {r["keep_id"]: r["n_members"] for r in g}
    assert by_keep == {1: 2, 3: 1}


def test_code_clone_near_duplicates_type3(spark):
    base = "def foo(x):\n    y = x + 1\n    z = y * 2\n    w = z - 3\n    return w\n"
    # renamed + one added statement: type-3 near-miss
    near = "def goo(a):\n    b = a + 9\n    c = b * 8\n    d = c - 7\n    e = d\n    return d\n"
    far = 'def other(s):\n    t = "x"\n    return t\n'
    pairs = code_clone_near_duplicates(
        _df(spark, [(1, base), (2, near), (3, far)]), threshold=0.3
    ).collect()
    assert len(pairs) == 1
    p = pairs[0]
    assert (p["id_a"], p["id_b"]) == (1, 2) and 0.3 <= p["jaccard"] < 1.0


def test_clone_pipeline_at_function_granularity(spark):
    src1 = "// SPDX-License-Identifier: MIT\ndef f(x):\n    return x + 1\ndef g(y):\n    return y * 2\n"
    src2 = "def h(q):\n    return q + 7\n"  # clone of f
    chunks = function_chunks(_df(spark, [(1, src1), (2, src2)]))
    packed = chunks.select(
        (F.col("doc_id") * 10 + F.col("fn_idx")).alias("cid"),
        F.col("chunk"),
    )
    g = code_clone_groups(packed, text_col="chunk", id_col="cid").collect()
    by_keep = {r["keep_id"]: r["n_members"] for r in g}
    assert by_keep == {10: 2, 11: 1}  # f≡h, g alone

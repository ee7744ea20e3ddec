"""Code-corpus curation operators — the source-code half of an LLM
pre-training data pipeline.

The reference repo (bbejeck/KafkaStreamsInteractiveQueries) has no
code-curation surface; this family belongs to the training-data
extension suite beside ``operators/text.py`` (natural-language
curation) and ``operators/dedup.py`` (near-dup machinery).  It covers
the three operations a code-ingesting pipeline cannot skip:

1. **License detection** (``spdx_license_headers``) — SPDX
   ``SPDX-License-Identifier:`` tags (the SPDX spec's machine-readable
   header convention) plus phrase-level fallbacks for the four big
   license families, as a pure Column regex pass over the file head.
2. **Comment stripping** (``strip_code_comments``) — ``//``/``#`` line
   and ``/* */`` block comments removed while double-quoted string
   literals are protected, as ONE ``regexp_replace`` whose alternation
   matches strings first and keeps them (``$1``).  Lookahead-free so
   the same pattern runs on RE2 engines.
3. **Identifier-normalized clone detection** — type-2 clones (renamed
   identifiers / changed literals, the SourcererCC / CCFinder clone
   taxonomy) collapse under ``normalized_code_col``; exact groups via
   ``code_clone_groups`` (md5-groupBy — the d1 shape) and type-3
   near-miss clones via ``code_clone_near_duplicates`` (MinHash-LSH
   over the normalized token stream — the d5 machinery parameterized).
   ``function_chunks`` splits files at function-definition markers so
   both run at FUNCTION granularity.

Scale shape: every normalization is a chain of whole-stage-codegen
``regexp_replace`` Columns — zero shuffle, no Python.  Clone grouping
is one skinny (32-byte fingerprint, id) aggregate; near-dup inherits
the capped-bucket LSH guarantees from ``operators/dedup``.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window, functions as F

# ---------------------------------------------------------------------------
# Shared regex fragments (lookahead-free: must run on both java.util.regex
# and RE2-based engines)
# ---------------------------------------------------------------------------

#: double-quoted string literal, single-line, backslash escapes honored
STRING_LIT = r'"(?:[^"\\\n]|\\.)*"'
#: /* ... */ block comment (multi-line), the classic lookahead-free form
BLOCK_COMMENT = r"/\*[^*]*\*+(?:[^/*][^*]*\*+)*/"
#: // and # line comments (newline NOT consumed)
LINE_COMMENT = r"//[^\n]*|#[^\n]*"
#: strings captured (kept via $1), comments matched uncaptured (dropped)
COMMENT_OR_STRING = f"({STRING_LIT})|(?:{BLOCK_COMMENT}|{LINE_COMMENT})"

#: keywords preserved by identifier normalization (language-family
#: superset: C/Java/JS/Python/Rust core control + declaration words).
#: Longest-first so the protect/unprotect alternations are unambiguous.
CODE_KEYWORDS = (
    "continue",
    "function",
    "return",
    "import",
    "struct",
    "while",
    "break",
    "class",
    "const",
    "else",
    "void",
    "def",
    "for",
    "int",
    "let",
    "var",
    "fn",
    "if",
)

SPDX_PATTERN = r"SPDX-License-Identifier:\s*([A-Za-z0-9.+-]+)"


def stripped_code_col(col: F.Column) -> F.Column:
    """Column: ``col`` with line/block comments removed and
    double-quoted string literals preserved (so ``"a // b"`` keeps its
    ``//``).  Whitespace the comment followed (the trailing newline of
    a line comment, spaces before an inline comment) is untouched —
    stripping is a pure deletion, byte-deterministic."""
    return F.regexp_replace(col, COMMENT_OR_STRING, "$1")


def strip_code_comments(
    code: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, stripped_text, n_chars, n_stripped_chars): the comment-free
    view of every file plus how many bytes stripping removed (a cheap
    comment-density signal for quality gates)."""
    stripped = stripped_code_col(F.col(text_col))
    return code.select(
        F.col(id_col),
        stripped.alias("stripped_text"),
        F.length(text_col).alias("n_chars"),
        (F.length(text_col) - F.length(stripped)).alias("n_stripped_chars"),
    )


def normalized_code_col(
    col: F.Column, keywords: tuple[str, ...] = CODE_KEYWORDS
) -> F.Column:
    """Column: identifier-normalized code for type-2 clone detection —
    comments stripped, string literals → ``S``, numeric literals →
    ``N``, identifiers → ``ID``, keywords and punctuation preserved.
    Two files differing only in naming and literal values normalize to
    the SAME string.

    Chain (order load-bearing): strip comments → protect strings as
    ``0S`` → protect keywords as ``0<kw>`` → numbers → ``0N`` →
    remaining identifiers → ``ID`` → unprotect (``0X`` → ``X``).  The
    digit-prefix protection works because neither the number regex
    (requires a trailing word boundary) nor the identifier regex
    (requires a leading one) can match inside ``0def``.  Input that
    already contains a literal ``0S``/``0N``/``0<keyword>`` token
    would be mangled by the unprotect pass — vanishingly unlikely in
    real code, and deterministic when it happens."""
    kw = "|".join(keywords)
    c = stripped_code_col(col)
    c = F.regexp_replace(c, STRING_LIT, "0S")
    c = F.regexp_replace(c, rf"\b({kw})\b", "0$1")
    c = F.regexp_replace(c, r"\b\d+(?:\.\d+)?\b", "0N")
    c = F.regexp_replace(c, r"\b[A-Za-z_][A-Za-z0-9_]*\b", "ID")
    return F.regexp_replace(c, rf"0(S|N|{kw})", "$1")


def spdx_license_headers(
    code: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    head_chars: int = 512,
) -> DataFrame:
    """(id, spdx_id, license_family, has_license): SPDX tag + phrase
    fallback detection over the first ``head_chars`` characters (real
    license headers lead the file; bounding the scan keeps the regex
    cost independent of file size).

    ``spdx_id`` is the verbatim tag value ('' when absent);
    ``license_family`` buckets it (mit/apache/gpl/bsd/other) or falls
    back to the family's canonical phrase when no tag exists; ``none``
    means neither.  ``has_license`` = tag or phrase found."""
    head = F.substring(F.col(text_col), 1, head_chars)
    spdx = F.regexp_extract(head, SPDX_PATTERN, 1)
    low = F.lower(head)
    sl = F.lower(spdx)
    family = (
        F.when(
            spdx != "",
            F.when(sl.startswith("mit"), "mit")
            .when(sl.startswith("apache"), "apache")
            .when(
                sl.startswith("gpl")
                | sl.startswith("lgpl")
                | sl.startswith("agpl"),
                "gpl",
            )
            .when(sl.startswith("bsd"), "bsd")
            .otherwise("other"),
        )
        .when(low.contains("permission is hereby granted"), "mit")
        .when(low.contains("apache license"), "apache")
        .when(low.contains("gnu general public license"), "gpl")
        .when(
            low.contains("redistribution and use in source and binary forms"),
            "bsd",
        )
        .otherwise("none")
    )
    return code.select(
        F.col(id_col),
        spdx.alias("spdx_id"),
        family.alias("license_family"),
        (family != "none").cast("int").alias("has_license"),
    )


def function_chunks(
    code: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    marker: str = "def ",
) -> DataFrame:
    """(id, fn_idx, chunk): the file split at function-definition
    markers — each chunk starts with ``marker`` (at file start or
    after a newline) and runs to the next definition.  Header /
    preamble text before the first definition is dropped (it is not a
    function).  ``fn_idx`` numbers a file's functions 0..n-1 in
    source order.

    Lookahead-free: a control byte is injected before each marker
    occurrence, then split — both steps pure Column ops.  The split is
    textual by design (no parser): a ``marker`` inside a string
    literal or comment would split early, which for corpus-curation
    granularity is an acceptable, deterministic approximation."""
    SEP = "\u0001"
    tagged = F.regexp_replace(
        F.col(text_col), "\n" + re.escape(marker), "\n" + SEP + marker
    )
    ex = code.select(
        F.col(id_col),
        F.posexplode(F.split(tagged, SEP)).alias("_pos", "chunk"),
    )
    fns = ex.filter(F.col("chunk").startswith(marker))
    w = Window.partitionBy(id_col).orderBy("_pos")
    return fns.select(
        F.col(id_col),
        (F.row_number().over(w) - 1).alias("fn_idx"),
        "chunk",
    )


def code_clone_groups(
    code: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keywords: tuple[str, ...] = CODE_KEYWORDS,
) -> DataFrame:
    """(clone_fp, n_members, keep_id): exact type-2 clone groups — all
    rows whose identifier-normalized text is byte-identical share an
    md5 fingerprint; the lowest id is the keeper.  Pass function
    chunks (with a composite id) for function-granularity clones.

    One skinny (fingerprint, id) shuffle with map-side partial
    aggregation — payloads never move (the ``exact_dedup_ids``
    shape)."""
    fp = F.md5(normalized_code_col(F.col(text_col), keywords))
    return (
        code.select(fp.alias("clone_fp"), F.col(id_col))
        .groupBy("clone_fp")
        .agg(
            F.count("*").alias("n_members"),
            F.min(id_col).alias("keep_id"),
        )
    )


def code_clone_near_duplicates(
    code: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keywords: tuple[str, ...] = CODE_KEYWORDS,
    num_hashes: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_bucket_size: int | None = 1024,
) -> DataFrame:
    """(id_a, id_b, jaccard): type-3 near-miss clones — MinHash-LSH
    over the identifier-normalized token stream, so a copied function
    with renamed variables AND a few added/removed statements still
    pairs with its origin.  Reuses the full d5 machinery (banded
    buckets with the REQUIRED quadratic-corner cap, size-pruned exact
    Jaccard verify); normalization is the only code-specific stage."""
    from kafkastreamsinteractivequeries_spark.operators.dedup import (
        minhash_near_duplicates,
    )

    normed = code.select(
        F.col(id_col),
        normalized_code_col(F.col(text_col), keywords).alias("_norm"),
    )
    return minhash_near_duplicates(
        normed,
        text_col="_norm",
        id_col=id_col,
        num_hashes=num_hashes,
        bands=bands,
        shingle_n=shingle_n,
        threshold=threshold,
        max_bucket_size=max_bucket_size,
    )

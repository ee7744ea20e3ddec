"""Pretraining-objective data transforms — the last hop between a
curated corpus and training examples for objectives other than plain
next-token prediction:

- **FIM** (fill-in-the-middle, Bavarian et al. arXiv:2207.14255): cut
  a document into prefix/middle/suffix at deterministic token
  boundaries and re-order with sentinel markers (PSM or SPM layout) so
  the model learns infilling — standard for code models.
- **Span corruption** (T5, Raffel et al. arXiv:1910.10683): replace
  short token spans with numbered sentinels, emit the (input, target)
  pair where the target spells out each sentinel's original tokens.

Both are pure Column transforms over the whitespace token array —
zero shuffle, zero Python — and fully DETERMINISTIC: cut points and
span starts come from md5 of (doc_id, position) through the repo's
first-6-hex-digits integer trick, never from rand(), so outputs are
reproducible across runs, engines, and partitionings and the DuckDB
oracle replays them exactly.  A production pipeline applies them at
token-id granularity after tokenization — :func:`fim_token_ids` and
:func:`span_corruption_ids` are that form (same draws keyed by doc
id, integer-id sentinels, arrays in / arrays out); the string forms
keep the arithmetic human-auditable and drive the byte-exact oracle
replays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kafkastreamsinteractivequeries_spark.operators.dedup import tokens_col

FIM_PREFIX = "<|fim_prefix|>"
FIM_MIDDLE = "<|fim_middle|>"
FIM_SUFFIX = "<|fim_suffix|>"


def _md5_int(*cols: F.Column) -> F.Column:
    """First 6 md5 hex digits of the '|'-joined inputs as a bigint —
    the repo's deterministic-bucket convention (exact in both
    engines; 24 bits of uniformity)."""
    return F.conv(
        F.substring(F.md5(F.concat_ws("|", *cols)), 1, 6), 16, 10
    ).cast("bigint")


def fim_transform(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rate_permille: int = 500,
) -> DataFrame:
    """Deterministic FIM: documents whose md5 bucket falls under
    ``rate_permille`` are cut at two hash-derived token boundaries
    ``0 ≤ lo ≤ hi ≤ n`` and re-rendered with sentinels — PSM layout
    (``<|fim_prefix|>P<|fim_suffix|>S<|fim_middle|>M``) for even
    hash parity, SPM (suffix first) for odd; the rest pass through
    untouched (``mode = 'plain'``).  Output: (id, mode, n_tokens,
    prefix_tokens, middle_tokens, suffix_tokens, rendered).

    NULL text degrades as the empty document (coalesced before
    tokenization — one empty token, the chat_loss_mask convention),
    never an error.

    The boundary draw is the standard uniform two-cut: lo/hi are two
    independent md5 draws mod (n+1), swapped into order — every
    split of the token sequence is reachable, and the empty
    middle/prefix/suffix edge cases are exercised rather than
    special-cased (a FIM pipeline must tolerate them).  Map-only."""
    toks = tokens_col(F.coalesce(F.col(text_col), F.lit("")))
    n = F.size(toks)
    pick = _md5_int(F.col(id_col).cast("string"), F.lit("fim")) % 1000
    c1 = _md5_int(F.col(id_col).cast("string"), F.lit("a")) % (n + 1)
    c2 = _md5_int(F.col(id_col).cast("string"), F.lit("b")) % (n + 1)
    lo, hi = F.least(c1, c2), F.greatest(c1, c2)
    spm = _md5_int(F.col(id_col).cast("string"), F.lit("m")) % 2 == 1
    base = docs.select(
        F.col(id_col),
        toks.alias("_t"),
        n.alias("_n"),
        (pick < rate_permille).alias("_fim"),
        lo.alias("_lo"),
        hi.alias("_hi"),
        spm.alias("_spm"),
    )
    t = F.col("_t")
    prefix = F.array_join(F.slice(t, 1, F.col("_lo").cast("int")), " ")
    middle = F.array_join(
        F.slice(
            t, (F.col("_lo") + 1).cast("int"), (F.col("_hi") - F.col("_lo")).cast("int")
        ),
        " ",
    )
    suffix = F.array_join(
        F.slice(
            t, (F.col("_hi") + 1).cast("int"), (F.col("_n") - F.col("_hi")).cast("int")
        ),
        " ",
    )
    psm = F.concat(
        F.lit(FIM_PREFIX), prefix, F.lit(FIM_SUFFIX), suffix,
        F.lit(FIM_MIDDLE), middle,
    )
    spm_r = F.concat(
        F.lit(FIM_SUFFIX), suffix, F.lit(FIM_PREFIX), prefix,
        F.lit(FIM_MIDDLE), middle,
    )
    return base.select(
        id_col,
        F.when(~F.col("_fim"), "plain")
        .when(F.col("_spm"), "spm")
        .otherwise("psm")
        .alias("mode"),
        F.col("_n").cast("long").alias("n_tokens"),
        F.when(F.col("_fim"), F.col("_lo"))
        .otherwise(F.col("_n"))
        .cast("long")
        .alias("prefix_tokens"),
        F.when(F.col("_fim"), F.col("_hi") - F.col("_lo"))
        .otherwise(0)
        .cast("long")
        .alias("middle_tokens"),
        F.when(F.col("_fim"), F.col("_n") - F.col("_hi"))
        .otherwise(0)
        .cast("long")
        .alias("suffix_tokens"),
        F.when(~F.col("_fim"), F.array_join(t, " "))
        .when(F.col("_spm"), spm_r)
        .otherwise(psm)
        .alias("rendered"),
    )


def span_corruption(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_len: int = 3,
    start_rate: int = 7,
) -> DataFrame:
    """Deterministic T5-style span corruption: a span of ``span_len``
    tokens starts at position ``i`` iff ``i ≡ 1 (mod span_len)`` AND
    the md5 draw for (doc, i) lands on ``% start_rate == 0`` — the
    phase constraint makes spans non-overlapping BY CONSTRUCTION
    (T5's random spans need overlap merging; the aligned grid trades
    a little start-position freedom for closed-form determinism) and
    the expected corruption rate is span_len/(span_len·start_rate) ≈
    1/start_rate of all tokens.  Spans shorter than ``span_len`` at
    the document tail are taken as-is.

    Output: (id, n_tokens, n_spans, corrupted_tokens, input, target)
    — ``input`` is the document with each span replaced by its
    ``<extra_id_k>`` sentinel (k in span order), ``target`` the
    sentinel-prefixed original spans, T5's exact convention.  All
    array expressions over the token sequence; map-only."""
    toks = tokens_col(F.coalesce(F.col(text_col), F.lit("")))
    base = docs.select(F.col(id_col), toks.alias("_t"), F.size(toks).alias("_n"))
    t, n = F.col("_t"), F.col("_n")
    idc = F.col(id_col).cast("string")

    def is_start(i: F.Column) -> F.Column:
        return (
            (i % span_len == 1)
            & (_md5_int(idc, F.lit("s"), i.cast("string")) % start_rate == 0)
        )

    starts = F.filter(
        F.sequence(F.lit(1), n), lambda i: is_start(i)
    )
    # span index of a start position = #starts at or before it (1-based)
    with_marks = base.select(
        id_col,
        "_t",
        "_n",
        starts.alias("_starts"),
    )
    st = F.col("_starts")

    # Segment-wise rendering, O(n + n_spans): each span (at transform
    # index j, so its sentinel number is j+1 with no rescan of the
    # starts array) emits the untouched tokens since the previous
    # span's end followed by its sentinel; one tail slice closes the
    # document.  The phase grid guarantees s_j ≥ s_{j-1} + span_len,
    # so every inter-span slice length is ≥ 0 (F.slice rejects
    # negative lengths).  This replaces the earlier per-position
    # transform whose span_k/in_span lambdas scanned the starts array
    # at every token — O(n_tokens × n_spans), ~5e8 lambda evals for a
    # 100k-token document at the defaults.
    def prev_end(j: F.Column) -> F.Column:
        return F.when(j == 0, F.lit(0).cast("bigint")).otherwise(
            F.element_at(st, j.cast("int")) + F.lit(span_len - 1)
        )

    last_end = F.when(
        F.size(st) > 0, F.element_at(st, -1) + F.lit(span_len - 1)
    ).otherwise(F.lit(0).cast("bigint"))
    input_parts = F.concat(
        F.flatten(
            F.transform(
                st,
                lambda s, j: F.concat(
                    F.slice(
                        t,
                        (prev_end(j) + 1).cast("int"),
                        (s - prev_end(j) - 1).cast("int"),
                    ),
                    F.array(
                        F.concat(
                            F.lit("<extra_id_"),
                            (j + 1).cast("string"),
                            F.lit(">"),
                        )
                    ),
                ),
            )
        ),
        F.slice(
            t,
            (F.least(last_end, n) + 1).cast("int"),
            F.greatest(n - last_end, F.lit(0).cast("bigint")).cast("int"),
        ),
    )
    target_parts = F.flatten(
        F.transform(
            st,
            lambda s, j: F.concat(
                F.array(
                    F.concat(
                        F.lit("<extra_id_"), (j + 1).cast("string"), F.lit(">")
                    )
                ),
                F.slice(
                    t,
                    s.cast("int"),
                    F.least(F.lit(span_len), n - s + 1).cast("int"),
                ),
            ),
        )
    )
    corrupted = F.aggregate(
        st,
        F.lit(0).cast("long"),
        lambda acc, s: acc + F.least(F.lit(span_len), n - s + 1),
    )
    return with_marks.select(
        id_col,
        n.cast("long").alias("n_tokens"),
        F.size(st).cast("long").alias("n_spans"),
        corrupted.alias("corrupted_tokens"),
        F.array_join(input_parts, " ").alias("input"),
        F.array_join(target_parts, " ").alias("target"),
    )


#: sentinel token ids for the ID-GRANULARITY transforms — callers
#: reserve these in their vocabulary (the training.ROLE_IDS pattern);
#: defaults sit right after the SFT specials
FIM_PREFIX_ID = 7
FIM_SUFFIX_ID = 8
FIM_MIDDLE_ID = 9
EXTRA_ID_BASE = 100  # <extra_id_k> → EXTRA_ID_BASE + k


def fim_token_ids(
    ids_df: DataFrame,
    id_col: str = "doc_id",
    ids_col: str = "token_ids",
    rate_permille: int = 500,
    prefix_id: int = FIM_PREFIX_ID,
    suffix_id: int = FIM_SUFFIX_ID,
    middle_id: int = FIM_MIDDLE_ID,
) -> DataFrame:
    """:func:`fim_transform` at TOKEN-ID granularity — the production
    form the module docstring promises: the same md5 two-cut draws
    (keyed by ``id_col``, so a document FIMs identically whether
    transformed as text or as ids), PSM/SPM layout by hash parity,
    but operating on an integer id array and emitting
    ``rendered_ids`` with single-id sentinels instead of marker
    strings.  Zero shuffle, map-only, rand()-free."""
    toks = F.coalesce(F.col(ids_col), F.array().cast("array<int>"))
    n = F.size(toks)
    idc = F.col(id_col).cast("string")
    pick = _md5_int(idc, F.lit("fim")) % 1000
    c1 = _md5_int(idc, F.lit("a")) % (n + 1)
    c2 = _md5_int(idc, F.lit("b")) % (n + 1)
    lo, hi = F.least(c1, c2), F.greatest(c1, c2)
    spm = _md5_int(idc, F.lit("m")) % 2 == 1
    base = ids_df.select(
        F.col(id_col),
        toks.alias("_t"),
        n.alias("_n"),
        (pick < rate_permille).alias("_fim"),
        lo.alias("_lo"),
        hi.alias("_hi"),
        spm.alias("_spm"),
    )
    t = F.col("_t")
    prefix = F.slice(t, 1, F.col("_lo").cast("int"))
    middle = F.slice(
        t, (F.col("_lo") + 1).cast("int"), (F.col("_hi") - F.col("_lo")).cast("int")
    )
    suffix = F.slice(
        t, (F.col("_hi") + 1).cast("int"), (F.col("_n") - F.col("_hi")).cast("int")
    )

    def _a(v: int) -> F.Column:
        return F.array(F.lit(v).cast("int"))

    psm = F.concat(_a(prefix_id), prefix, _a(suffix_id), suffix, _a(middle_id), middle)
    spm_r = F.concat(_a(suffix_id), suffix, _a(prefix_id), prefix, _a(middle_id), middle)
    return base.select(
        id_col,
        F.when(~F.col("_fim"), "plain")
        .when(F.col("_spm"), "spm")
        .otherwise("psm")
        .alias("mode"),
        F.col("_n").cast("long").alias("n_tokens"),
        F.when(F.col("_fim"), F.col("_lo"))
        .otherwise(F.col("_n"))
        .cast("long")
        .alias("prefix_tokens"),
        F.when(F.col("_fim"), F.col("_hi") - F.col("_lo"))
        .otherwise(0)
        .cast("long")
        .alias("middle_tokens"),
        F.when(F.col("_fim"), F.col("_n") - F.col("_hi"))
        .otherwise(0)
        .cast("long")
        .alias("suffix_tokens"),
        F.when(~F.col("_fim"), t)
        .when(F.col("_spm"), spm_r)
        .otherwise(psm)
        .alias("rendered_ids"),
    )


def span_corruption_ids(
    ids_df: DataFrame,
    id_col: str = "doc_id",
    ids_col: str = "token_ids",
    span_len: int = 3,
    start_rate: int = 7,
    extra_id_base: int = EXTRA_ID_BASE,
) -> DataFrame:
    """:func:`span_corruption` at TOKEN-ID granularity: the same
    aligned md5 start grid (keyed by ``id_col`` — identical spans for
    text and id forms of the same document), segment-wise O(n +
    n_spans) rendering, sentinel ``<extra_id_k>`` as the single id
    ``extra_id_base + k``.  Output: (id, n_tokens, n_spans,
    corrupted_tokens, input_ids, target_ids)."""
    toks = F.coalesce(F.col(ids_col), F.array().cast("array<int>"))
    base = ids_df.select(F.col(id_col), toks.alias("_t"), F.size(toks).alias("_n"))
    t, n = F.col("_t"), F.col("_n")
    idc = F.col(id_col).cast("string")

    def is_start(i: F.Column) -> F.Column:
        return (
            (i % span_len == 1)
            & (_md5_int(idc, F.lit("s"), i.cast("string")) % start_rate == 0)
        )

    starts = F.filter(F.sequence(F.lit(1), n), lambda i: is_start(i))
    with_marks = base.select(id_col, "_t", "_n", starts.alias("_starts"))
    st = F.col("_starts")

    def sentinel(j: F.Column) -> F.Column:
        return (j + 1 + F.lit(extra_id_base)).cast("int")

    def prev_end(j: F.Column) -> F.Column:
        return F.when(j == 0, F.lit(0).cast("bigint")).otherwise(
            F.element_at(st, j.cast("int")) + F.lit(span_len - 1)
        )

    last_end = F.when(
        F.size(st) > 0, F.element_at(st, -1) + F.lit(span_len - 1)
    ).otherwise(F.lit(0).cast("bigint"))
    input_ids = F.concat(
        F.flatten(
            F.transform(
                st,
                lambda s, j: F.concat(
                    F.slice(
                        t,
                        (prev_end(j) + 1).cast("int"),
                        (s - prev_end(j) - 1).cast("int"),
                    ),
                    F.array(sentinel(j)),
                ),
            )
        ),
        F.slice(
            t,
            (F.least(last_end, n) + 1).cast("int"),
            F.greatest(n - last_end, F.lit(0).cast("bigint")).cast("int"),
        ),
    )
    target_ids = F.flatten(
        F.transform(
            st,
            lambda s, j: F.concat(
                F.array(sentinel(j)),
                F.slice(
                    t,
                    s.cast("int"),
                    F.least(F.lit(span_len), n - s + 1).cast("int"),
                ),
            ),
        )
    )
    corrupted = F.aggregate(
        st,
        F.lit(0).cast("long"),
        lambda acc, s: acc + F.least(F.lit(span_len), n - s + 1),
    )
    return with_marks.select(
        id_col,
        n.cast("long").alias("n_tokens"),
        F.size(st).cast("long").alias("n_spans"),
        corrupted.alias("corrupted_tokens"),
        input_ids.alias("input_ids"),
        target_ids.alias("target_ids"),
    )

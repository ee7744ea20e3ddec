"""Preference-pair (RLHF/DPO) data operators — the checks a reward or
preference dataset needs before training: pair-level dedup, per-prompt
response diversity, eval-prompt decontamination, and the length-bias
diagnostics that catch reward hacking at the data layer.

A pairs table is (pair_id, prompt, chosen, rejected).  Everything here
is Column-only and integer-exact (ratios in permille via integer
``div``), the repo's oracle-replayable discipline; fingerprints are
md5 over the normalized fields joined with a separator no normalized
text can contain (normalization collapses whitespace, so '\\n' is
safe) — the ``exact_dedup`` convention.

Scale shapes: dedup and grouping are min-struct / count aggregates on
skinny fingerprint keys (payloads never shuffle twice); eval
decontamination broadcasts the eval side and leaves the corpus
unshuffled (the x13 contract); the bias report is one aggregate row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kafkastreamsinteractivequeries_spark.operators.dedup import (
    normalized_text,
    tokens_col,
)

_SEP = "\n"


def _pair_fingerprint() -> F.Column:
    # coalesce BEFORE fingerprinting: concat_ws silently SKIPS nulls,
    # which would make (NULL, x, y) collide with (x, y) — a null field
    # fingerprints as the empty string instead
    return F.md5(
        F.concat_ws(
            _SEP,
            normalized_text(F.coalesce(F.col("prompt"), F.lit(""))),
            normalized_text(F.coalesce(F.col("chosen"), F.lit(""))),
            normalized_text(F.coalesce(F.col("rejected"), F.lit(""))),
        )
    )


def preference_pair_stats(pairs: DataFrame) -> DataFrame:
    """Per-pair diagnostics: whitespace token counts of each field,
    the chosen/rejected length ratio in integer permille, and the
    DEGENERATE flag (chosen == rejected after normalization — a pair
    that teaches nothing and poisons DPO loss).  Map-only."""
    n_p = F.size(tokens_col(F.coalesce(F.col("prompt"), F.lit(""))))
    n_c = F.size(tokens_col(F.coalesce(F.col("chosen"), F.lit(""))))
    n_r = F.size(tokens_col(F.coalesce(F.col("rejected"), F.lit(""))))
    return pairs.select(
        "pair_id",
        n_p.cast("long").alias("prompt_tokens"),
        n_c.cast("long").alias("chosen_tokens"),
        n_r.cast("long").alias("rejected_tokens"),
        # floor(a/b) on nonnegative counts == integer div, and it is
        # the form both engines share (the floor-div determinism rule)
        F.when(n_r > 0, F.floor((F.lit(1000) * n_c) / n_r))
        .cast("long")
        .alias("len_ratio_permille"),
        F.when(
            normalized_text(F.col("chosen"))
            == normalized_text(F.col("rejected")),
            1,
        )
        .otherwise(0)
        .cast("int")
        .alias("degenerate"),
    )


def dedup_preference_pairs(pairs: DataFrame) -> DataFrame:
    """Exact pair-level dedup: first occurrence (lowest pair_id) per
    (prompt, chosen, rejected) normalized fingerprint, with the
    collapse count — the ``exact_dedup`` min-struct aggregate on the
    skinny fingerprint key.  Output: (pair_id, prompt, chosen,
    rejected, fingerprint, n_dups)."""
    fp = pairs.select("*", _pair_fingerprint().alias("fingerprint"))
    return (
        fp.groupBy("fingerprint")
        .agg(
            F.min(
                F.struct("pair_id", "prompt", "chosen", "rejected")
            ).alias("_w"),
            F.count(F.lit(1)).cast("long").alias("n_dups"),
        )
        .select(
            F.col("_w.pair_id").alias("pair_id"),
            F.col("_w.prompt").alias("prompt"),
            F.col("_w.chosen").alias("chosen"),
            F.col("_w.rejected").alias("rejected"),
            "fingerprint",
            "n_dups",
        )
    )


def prompt_response_diversity(pairs: DataFrame) -> DataFrame:
    """Per-prompt table: pair count, DISTINCT chosen-response count,
    and the first pair id — the repeated-prompt profile (a prompt
    with many pairs but one distinct chosen response is a label-noise
    or scraping artifact; preference training wants diverse
    comparisons per prompt).  Count-distinct plans as Spark's
    two-phase expand — no hot-prompt funnel."""
    norm_p = normalized_text(F.col("prompt"))
    norm_c = normalized_text(F.col("chosen"))
    return (
        pairs.select(
            F.md5(norm_p).alias("prompt_fp"),
            F.md5(norm_c).alias("chosen_fp"),
            "pair_id",
        )
        .groupBy("prompt_fp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.countDistinct("chosen_fp").cast("long").alias("n_distinct_chosen"),
            F.min("pair_id").cast("long").alias("first_pair_id"),
        )
    )


def decontaminate_preference_prompts(
    pairs: DataFrame, eval_prompts: DataFrame, prompt_col: str = "prompt"
) -> DataFrame:
    """Drop pairs whose normalized prompt appears in an eval set — the
    RLHF twin of benchmark decontamination (a reward model that has
    seen an eval prompt's comparisons leaks the benchmark): anti-join
    on the prompt fingerprint, eval side broadcast, the corpus never
    shuffles (the x13 contract)."""
    evals = eval_prompts.select(
        F.md5(normalized_text(F.col(prompt_col))).alias("_efp")
    ).distinct()
    return pairs.join(
        F.broadcast(evals),
        F.md5(normalized_text(F.col("prompt"))) == F.col("_efp"),
        "left_anti",
    )


def length_bias_report(pairs: DataFrame) -> DataFrame:
    """One-row reward-hacking diagnostic: how often the CHOSEN
    response is simply the longer one.  Columns: n_pairs,
    chosen_longer_permille, mean token delta (chosen − rejected) in
    exact integer micro-units, and the degenerate-pair count.  A
    healthy preference set sits near 500‰; >700‰ means length is the
    label.  One aggregate row — no shuffle beyond the partial-agg
    combine."""
    n_c = F.size(tokens_col(F.coalesce(F.col("chosen"), F.lit(""))))
    n_r = F.size(tokens_col(F.coalesce(F.col("rejected"), F.lit(""))))
    degen = (
        normalized_text(F.col("chosen")) == normalized_text(F.col("rejected"))
    ).cast("long")
    return pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.floor(
            (F.lit(1000) * F.sum((n_c > n_r).cast("long"))) / F.count(F.lit(1))
        )
        .cast("long")
        .alias("chosen_longer_permille"),
        F.floor(
            (F.lit(1_000_000) * F.sum(n_c.cast("long") - n_r.cast("long")))
            / F.count(F.lit(1))
        )
        .cast("long")
        .alias("mean_delta_micro"),
        F.sum(degen).cast("long").alias("n_degenerate"),
    )

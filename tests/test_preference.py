"""Unit tests for operators/preference.py (RLHF/DPO pair prep)."""

from kafkastreamsinteractivequeries_spark.operators.preference import (
    decontaminate_preference_prompts,
    dedup_preference_pairs,
    length_bias_report,
    preference_pair_stats,
    prompt_response_diversity,
)

PAIRS = [
    # (pair_id, prompt, chosen, rejected)
    (1, "what is two plus two", "it is four", "five maybe"),
    (2, "what is two plus two", "it is four", "five maybe"),   # exact dup
    (3, "What is  TWO plus two", "It is FOUR", "five   maybe"),  # dup after norm
    (4, "name a color", "blue", "blue"),                        # degenerate
    (5, "name a color", "red is a color", "no"),
    (6, "tell a story", "once upon a time there was a whale", "no"),
]


def _df(spark):
    return spark.createDataFrame(
        PAIRS, "pair_id long, prompt string, chosen string, rejected string"
    )


def test_pair_stats_and_degenerate(spark):
    out = {r["pair_id"]: r for r in preference_pair_stats(_df(spark)).collect()}
    assert out[1]["prompt_tokens"] == 5
    assert out[1]["chosen_tokens"] == 3 and out[1]["rejected_tokens"] == 2
    assert out[1]["len_ratio_permille"] == 1500
    assert out[4]["degenerate"] == 1
    assert sum(r["degenerate"] for r in out.values()) == 1


def test_dedup_pairs(spark):
    kept = {r["pair_id"]: r for r in dedup_preference_pairs(_df(spark)).collect()}
    # 1,2,3 collapse (normalization lowercases + collapses whitespace)
    assert set(kept) == {1, 4, 5, 6}
    assert kept[1]["n_dups"] == 3
    assert all(r["n_dups"] == 1 for pid, r in kept.items() if pid != 1)
    # partitioning invariance
    again = {
        r["pair_id"]: r["n_dups"]
        for r in dedup_preference_pairs(_df(spark).repartition(5)).collect()
    }
    assert again == {pid: r["n_dups"] for pid, r in kept.items()}


def test_prompt_diversity(spark):
    rows = prompt_response_diversity(_df(spark)).collect()
    by_first = {r["first_pair_id"]: r for r in rows}
    # "what is two plus two": 3 pairs, 1 distinct chosen
    assert by_first[1]["n_pairs"] == 3 and by_first[1]["n_distinct_chosen"] == 1
    # "name a color": 2 pairs, 2 distinct chosen
    assert by_first[4]["n_pairs"] == 2 and by_first[4]["n_distinct_chosen"] == 2


def test_decontaminate_prompts(spark):
    evals = spark.createDataFrame(
        [("WHAT is two plus TWO",), ("unrelated eval prompt",)],
        "prompt string",
    )
    survivors = {
        r["pair_id"]
        for r in decontaminate_preference_prompts(_df(spark), evals).collect()
    }
    assert survivors == {4, 5, 6}  # all two-plus-two pairs dropped


def test_length_bias_report(spark):
    r = length_bias_report(_df(spark)).collect()[0]
    assert r["n_pairs"] == 6
    # chosen longer in pairs 1,2,3,5,6 -> 5/6
    assert r["chosen_longer_permille"] == 1000 * 5 // 6
    deltas = [3-2, 3-2, 3-2, 1-1, 4-1, 8-1]
    assert r["mean_delta_micro"] == 1_000_000 * sum(deltas) // 6
    assert r["n_degenerate"] == 1

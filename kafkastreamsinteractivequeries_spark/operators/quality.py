"""Single-pass data-validation constraints (the Deequ/dbt-test shape).

A 100 TB ingest lands nothing without a validation gate, and the gate
must not cost N table scans for N rules.  ``check_constraints`` compiles
every rule into a conditional-count expression and evaluates the WHOLE
suite in ONE aggregate pass over the table (uniqueness rules add one
extra aggregate each, keyed on their column set — unavoidable: they are
genuinely distributive-aggregation-shaped, and they still partial-agg
map-side).

Rules are plain tuples, not a DSL:

    ("not_null", col)              — no NULLs in col
    ("unique", [cols])             — no duplicate (cols) combination
    ("range", col, lo, hi)         — lo ≤ value ≤ hi (NULLs don't pass)
    ("in_set", col, [values])      — value ∈ set (NULLs don't pass)
    ("matches", col, regex)        — full-match regex (NULLs don't pass)
    ("expr", name, sql_predicate)  — SQL predicate must hold (NULLs don't pass)

Output: one row per rule — (rule, column, violations, total_rows,
passed) — collectable at any scale (bounded by rule count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _rule_label(rule: tuple) -> tuple[str, str]:
    kind = rule[0]
    if kind == "unique":
        return kind, ",".join(rule[1])
    if kind == "expr":
        return kind, rule[1]
    return kind, rule[1]


def _violation_expr(rule: tuple) -> F.Column:
    kind = rule[0]
    if kind == "not_null":
        cond = F.col(rule[1]).isNull()
    elif kind == "range":
        _, c, lo, hi = rule
        cond = ~F.col(c).between(lo, hi) | F.col(c).isNull()
    elif kind == "in_set":
        _, c, values = rule
        cond = ~F.col(c).isin(list(values)) | F.col(c).isNull()
    elif kind == "matches":
        _, c, pattern = rule
        cond = ~F.col(c).rlike(f"^(?:{pattern})$") | F.col(c).isNull()
    elif kind == "expr":
        _, _name, predicate = rule
        # NULL predicate results count as violations ("NULLs don't
        # pass", matching every other rule): a bare ~expr is NULL for
        # NULL inputs and when(NULL, 1) silently yields 0.
        cond = ~F.coalesce(F.expr(predicate), F.lit(False))
    else:
        raise ValueError(f"unknown rule kind {kind!r}")
    return F.sum(F.when(cond, 1).otherwise(0))


def check_constraints(df: DataFrame, rules: list[tuple]) -> DataFrame:
    """Evaluate the rule suite; see module docstring for the rule
    grammar and the one-pass design."""
    spark = df.sparkSession
    scalar_rules = [r for r in rules if r[0] != "unique"]
    unique_rules = [r for r in rules if r[0] == "unique"]

    reports: list[DataFrame] = []
    if scalar_rules:
        aggs = [F.count("*").alias("_total")]
        for i, r in enumerate(scalar_rules):
            aggs.append(_violation_expr(r).alias(f"_v{i}"))
        row = df.agg(*aggs)
        # Unpivot the single agg row via explode, NOT one unioned
        # Project per rule: unioned selects of the same DataFrame each
        # re-execute its whole subplan (N rules = N table scans —
        # exactly the cost this operator exists to avoid; plan-asserted
        # by test_quality_gates_constraint_branch_is_single_pass).
        rule_structs = []
        for i, r in enumerate(scalar_rules):
            kind, label = _rule_label(r)
            rule_structs.append(
                F.struct(
                    F.lit(kind).alias("rule"),
                    F.lit(label).alias("column"),
                    F.coalesce(F.col(f"_v{i}"), F.lit(0))
                    .cast("long")
                    .alias("violations"),
                    F.col("_total").alias("total_rows"),
                )
            )
        reports.append(
            row.select(F.explode(F.array(*rule_structs)).alias("_r")).select(
                "_r.rule", "_r.column", "_r.violations", "_r.total_rows"
            )
        )

    for r in unique_rules:
        cols = r[1]
        dup = (
            df.groupBy(*cols)
            .agg(F.count("*").alias("_n"))
            .agg(
                F.coalesce(F.sum(F.when(F.col("_n") > 1, F.col("_n"))), F.lit(0))
                .cast("long")
                .alias("violations"),
                F.coalesce(F.sum("_n"), F.lit(0)).cast("long").alias("total_rows"),
            )
            .select(
                F.lit("unique").alias("rule"),
                F.lit(",".join(cols)).alias("column"),
                "violations",
                "total_rows",
            )
        )
        reports.append(dup)

    if not reports:
        return spark.createDataFrame(
            [], "rule string, column string, violations long, total_rows long, passed boolean"
        )
    out = reports[0]
    for p in reports[1:]:
        out = out.unionByName(p)
    return out.withColumn("passed", F.col("violations") == 0)


class ConstraintViolation(ValueError):
    """Typed gate failure carrying the STRUCTURED failure list —
    callers branch on ``failures`` (list of row-dicts from
    ``check_constraints``), never on the rendered message (rule names
    may contain any character, so message parsing miscounts)."""

    def __init__(self, failures: list[dict]):
        self.failures = failures
        super().__init__(
            "constraint violations: "
            + "; ".join(
                f"{f['rule']}({f['column']}): "
                f"{f['violations']}/{f['total_rows']} rows"
                for f in failures
            )
        )


def assert_constraints(df: DataFrame, rules: list[tuple]) -> None:
    """Raise ``ConstraintViolation`` (a ``ValueError``) listing every
    failed rule (gate form for pipelines: land nothing when validation
    fails)."""
    failed = [
        r.asDict()
        for r in check_constraints(df, rules).collect()
        if not r["passed"]
    ]
    if failed:
        raise ConstraintViolation(failed)

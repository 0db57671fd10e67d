"""Generic data-quality check runner mirroring the reference's dbt tests
(models/staging/schema.yml:19-139 + tests/assert_*.sql — the
query-returns-zero-rows convention, reported as violation counts per rule).

Each check builds a DataFrame whose single row is (rule, violations); the
runner unions them into one report. Everything is a plain aggregate or
anti-join — one shuffle per check, map-side partial aggregation, no
collect() until the caller materializes the report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unique(df: DataFrame, cols: list[str], rule: str) -> DataFrame:
    """dbt `unique`: count of key groups appearing more than once
    (tests/assert_unique_game_id.sql:1-4 shape)."""
    return (
        df.groupBy(*cols)
        .count()
        .filter(F.col("count") > 1)
        .agg(F.count("*").alias("violations"))
        .select(F.lit(rule).alias("rule"), "violations")
    )


def not_null(df: DataFrame, col: str, rule: str) -> DataFrame:
    """dbt `not_null` (assert_games_not_null.sql:1-3 shape). SUM over an
    empty table is NULL — coalesced to 0 so an empty input reports zero
    violations, consistent with :func:`row_rules_single_pass`."""
    return df.agg(
        F.coalesce(F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias("violations")
    ).select(F.lit(rule).alias("rule"), "violations")


def accepted_range(
    df: DataFrame, col: str, lo, hi, rule: str
) -> DataFrame:
    """dbt_utils `accepted_range` (schema.yml:29-33,82-97 shape). Nulls are
    not violations (dbt tests them separately via not_null); an empty table
    reports 0, not NULL."""
    bad = F.col(col).isNotNull() & ~F.col(col).between(lo, hi)
    return df.agg(
        F.coalesce(F.sum(F.when(bad, 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias("violations")
    ).select(F.lit(rule).alias("rule"), "violations")


def relationships(
    child: DataFrame,
    child_col: str,
    parent: DataFrame,
    parent_col: str,
    rule: str,
) -> DataFrame:
    """dbt `relationships` (FK containment — schema.yml:79-81,104-106;
    assert_foreign_key_crawl_state.sql:1-4): child keys missing from the
    parent, via left_anti join (parent side broadcast when small)."""
    missing = child.select(F.col(child_col)).filter(
        F.col(child_col).isNotNull()
    ).join(
        parent.select(F.col(parent_col).alias(child_col)),
        child_col,
        "left_anti",
    )
    return missing.agg(F.count("*").alias("violations")).select(
        F.lit(rule).alias("rule"), "violations"
    )


def row_rules_single_pass(df: DataFrame, rules: list[tuple[str, "F.Column"]]) -> DataFrame:
    """All row-level rules for one table in ONE scan.

    ``rules`` is [(rule_name, violation_condition)], each condition a boolean
    Column over a single row (the not_null / accepted_range family — anything
    that doesn't need a groupBy or a join). One aggregate computes every
    rule's violation count with map-side partial aggregation, then a
    ``stack`` unpivots the single result row into (rule, violations) rows.

    At 100 TB this is the difference between N full scans of a table (one
    per rule, as N independent checks) and one scan for its whole rule set —
    the unpivot runs on a 1-row DataFrame, so it costs nothing.
    """
    agg = df.agg(
        *[
            F.coalesce(F.sum(F.when(cond, 1).otherwise(0)), F.lit(0))
            .cast("long")
            .alias(f"v{i}")
            for i, (_, cond) in enumerate(rules)
        ]
    )
    # Rule names are interpolated into the stack() SQL — escape embedded
    # single quotes so a name like "game's id" can't break the expression.
    pairs = ", ".join(
        "'{}', v{}".format(name.replace("'", "''"), i)
        for i, (name, _) in enumerate(rules)
    )
    return agg.select(
        F.expr(f"stack({len(rules)}, {pairs}) AS (rule, violations)")
    )


def not_null_rule(col: str):
    """Violation condition for :func:`row_rules_single_pass` — dbt
    `not_null`."""
    return F.col(col).isNull()


def accepted_range_rule(col: str, lo, hi):
    """Violation condition for :func:`row_rules_single_pass` — dbt_utils
    `accepted_range` (nulls are not violations; dbt tests those via
    not_null)."""
    return F.col(col).isNotNull() & ~F.col(col).between(lo, hi)


def run_checks(checks: list[DataFrame]) -> DataFrame:
    """Union per-check reports into one (rule, violations) DataFrame."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out

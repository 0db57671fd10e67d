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
    """dbt `not_null` (assert_games_not_null.sql:1-3 shape)."""
    return df.agg(
        F.sum(F.when(F.col(col).isNull(), 1).otherwise(0))
        .cast("long")
        .alias("violations")
    ).select(F.lit(rule).alias("rule"), "violations")


def accepted_range(
    df: DataFrame, col: str, lo, hi, rule: str
) -> DataFrame:
    """dbt_utils `accepted_range` (schema.yml:29-33,82-97 shape). Nulls are
    not violations (dbt tests them separately via not_null)."""
    bad = F.col(col).isNotNull() & ~F.col(col).between(lo, hi)
    return df.agg(
        F.sum(F.when(bad, 1).otherwise(0)).cast("long").alias("violations")
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


def run_checks(checks: list[DataFrame]) -> DataFrame:
    """Union per-check reports into one (rule, violations) DataFrame."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out

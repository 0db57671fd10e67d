"""Top-K and latest-per-key operators.

- top_k: global top-k with deterministic tie-breaks. Physically a
  TakeOrderedAndProject: per-partition top-k, then a k·p merge — no full
  sort, no full shuffle, safe at any scale for small k. T3 (the
  reference's sorted-file iteration) is subsumed: under set semantics an
  ORDER BY + LIMIT plan replaces row-at-a-time sorted scans.
  (Reference semantics: top-2000 games by player count —
  realtime/steam-crawl-playercount.py:72-90; the reference's sort-key bug is
  deliberately not replicated, per SURVEY.md §7.)

- latest_per_key: row_number over (key / order desc) == 1 — the reference's
  `ORDER BY timestamp DESC LIMIT 1` point lookup (kafka/consumers/
  kafka_consumer_prices.py:37-42) and pandas `drop_duplicates(keep='last')`
  (utils/your_module.py:129), done set-orientedly in one shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, order_col: str, k: int, *tiebreak_cols: str) -> DataFrame:
    """Global top-k by ``order_col`` desc, ties broken by ``tiebreak_cols`` asc."""
    order = [F.desc(order_col)] + [F.asc(c) for c in tiebreak_cols]
    return df.orderBy(*order).limit(k)


def latest_per_key(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    *tiebreak_cols: str,
) -> DataFrame:
    """Keep the single latest row per key (order_col desc, tiebreaks desc).

    Deterministic replacement for dropDuplicates-keep-last.
    """
    w = Window.partitionBy(*key_cols).orderBy(
        F.desc(order_col), *[F.desc(c) for c in tiebreak_cols]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

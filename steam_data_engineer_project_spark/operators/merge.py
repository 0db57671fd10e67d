"""Set-oriented merge/upsert strategies.

The reference uses three distinct conflict-resolution rules against mutable
stores; Spark tables are immutable, so each becomes a read-merge-overwrite
(or the merge step of a ``foreachBatch``):

- upsert_last_wins:    MySQL ``INSERT ... ON DUPLICATE KEY UPDATE`` with
                       plain overwrite (kafka/consumers/kafka_consumer_info.py:39-51)
                       and Mongo ``update_one(..., upsert=True)``
                       (kafka/consumers/kafka_consumer_reviews.py:61-65).
- insert_ignore:       MySQL ``INSERT IGNORE`` — keep existing, add absent
                       (kafka/consumers/kafka_consumer_info.py:56-68).
- merge_monotone_max:  ``ON DUPLICATE KEY UPDATE x = GREATEST(x, :new)`` —
                       late events never regress a per-key watermark
                       (kafka/consumers/kafka_consumer_reviews.py:69-73).

Each is one keyed shuffle (window or groupBy on the merge key). In a
foreachBatch loop the incoming side is a micro-batch, so the existing side
dominates; at scale the existing table should be bucketed by the key so the
merge join is co-located.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def upsert_last_wins(
    existing: DataFrame,
    incoming: DataFrame,
    key_cols: list[str],
    order_col: str | None = None,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Union then keep one row per key, preferring incoming (and within each
    side the greatest ``order_col`` when given).

    ``order_col=None`` means pure processing-order precedence: any incoming
    row beats any existing row for its key. ``tiebreak_cols`` (descending)
    make the survivor deterministic when ``order_col`` ties within a side.
    """
    ex = existing.withColumn("__src", F.lit(0))
    inc = incoming.withColumn("__src", F.lit(1))
    merged = ex.unionByName(inc)
    order = [F.desc("__src")] + ([F.desc(order_col)] if order_col else [])
    order += [F.desc(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )


def insert_ignore(
    existing: DataFrame,
    incoming: DataFrame,
    key_cols: list[str],
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Keep existing rows untouched; add incoming rows whose key is absent.

    Incoming duplicates (same key twice in the batch) keep one row, matching
    INSERT IGNORE's first-wins per statement. ``order_cols`` (ascending)
    define "first" deterministically; without them ``dropDuplicates`` keeps
    an arbitrary row (fine when payloads per key are identical).
    """
    deduped = incoming
    if order_cols:
        w = Window.partitionBy(*key_cols).orderBy(*[F.asc(c) for c in order_cols])
        deduped = (
            incoming.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    else:
        deduped = incoming.dropDuplicates(key_cols)
    fresh = deduped.join(existing.select(*key_cols), key_cols, "left_anti")
    return existing.unionByName(fresh)


def merge_monotone_max(
    existing: DataFrame,
    incoming: DataFrame,
    key_cols: list[str],
    value_col: str,
) -> DataFrame:
    """Per-key GREATEST merge: max(value) across both sides per key; keys
    present on either side survive. Late/out-of-order arrivals can never
    regress the stored value.
    """
    merged = existing.select(*key_cols, value_col).unionByName(
        incoming.select(*key_cols, value_col)
    )
    return merged.groupBy(*key_cols).agg(F.max(value_col).alias(value_col))

"""Sessionization: assign session ids by inactivity gap.

Classic lag + conditional cumsum over a per-key ordered window — two window
functions over the same (key, ts) partitioning, so Spark plans a single
shuffle + sort and evaluates both in one pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    *tiebreak_cols: str,
) -> DataFrame:
    """Add a ``session_id`` column (1-based per key): a new session starts
    when the gap to the previous event exceeds ``gap_seconds``.
    """
    order = [F.asc(ts_col)] + [F.asc(c) for c in tiebreak_cols]
    w = Window.partitionBy(key_col).orderBy(*order)
    gap = F.col(ts_col).cast("double") - F.lag(F.col(ts_col).cast("double")).over(w)
    new_session = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )

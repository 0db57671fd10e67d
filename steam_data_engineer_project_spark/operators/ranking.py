"""Distributed global ranking without a single-partition window.

``Window.orderBy(col)`` with no ``partitionBy`` moves every row to one
partition — fine for a 150-row dimension, a scale-killer for high-cardinality
keys. ``global_row_number`` produces the identical result with the classic
two-phase plan:

1. range-repartition by the sort key (parallel sort, equal keys co-located);
2. local ``row_number`` within each physical partition;
3. per-partition counts (tiny — one row per partition) -> cumulative offsets
   via a window over that tiny side only;
4. broadcast-join the offsets back and add.

Every stage is distributed; the only single-partition work is the offset
cumsum over ≤ ``numPartitions`` rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "row_num",
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach a 1-based global row number ordered by ``order_cols``.

    Equivalent to ``row_number() OVER (ORDER BY order_cols)`` but scalable:
    no single-partition exchange on the data path. For globally-unique
    ``order_cols`` values this also equals ``dense_rank``/``rank``.

    Ties across the ordering columns land in the same range partition
    (RangePartitioner co-locates equal keys), so ordering within ties is
    partition-local and deterministic given the full order_cols list is a
    total order.
    """
    ranged = (
        df.repartitionByRange(num_partitions, *order_cols)
        if num_partitions
        else df.repartitionByRange(*order_cols)
    )
    with_pid = ranged.withColumn("__pid", F.spark_partition_id())

    w_local = Window.partitionBy("__pid").orderBy(*order_cols)
    # Both downstream branches (the offsets aggregate and the final join)
    # re-derive __pid from the range exchange, and RangePartitioner sampling
    # is seeded per-RDD — correctness requires both branches to see ONE
    # materialization of the ranged result, not ReuseExchange luck.
    # localCheckpoint (not persist): DataFrame.persist registers in the
    # CacheManager, which holds the entry until an explicit unpersist — a
    # storage leak from an operator that can't know when its lazy result was
    # consumed. Checkpoint blocks are owned by the RDD and reclaimed by the
    # ContextCleaner once the plan is garbage-collected, and the truncated
    # lineage gives both branches the same materialization by construction.
    # Trade-offs accepted: localCheckpoint blocks are NOT fault-tolerant
    # (losing the executor holding them — e.g. under dynamic allocation —
    # fails the job instead of recomputing) and materialize eagerly even if
    # the caller never consumes the result. On a cluster where that
    # matters, swap in reliable checkpoint() to HDFS, as components.py
    # recommends for its iteration.
    local = with_pid.withColumn(
        "__local_rn", F.row_number().over(w_local)
    ).localCheckpoint()

    # One row per physical partition — tiny; the cumsum window over it is the
    # only non-parallel step and is O(num_partitions).
    counts = local.groupBy("__pid").agg(F.max("__local_rn").alias("__cnt"))
    w_off = (
        Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "__offset", F.coalesce(F.sum("__cnt").over(w_off), F.lit(0))
    ).select("__pid", "__offset")

    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, (F.col("__offset") + F.col("__local_rn")).cast("long"))
        .drop("__pid", "__local_rn", "__offset")
    )

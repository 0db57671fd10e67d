"""Shared foreachBatch drain: stream → ``<out_dir>/batch_id=N`` parquet.

Both engine-original streaming designs (applyInPandasWithState updates,
watermarked append-mode windows) materialize their micro-batches the same
way: one overwrite-mode parquet directory per batch_id (overwrite → a
replayed batch rewrites its own dir, so the union over dirs is
replay-idempotent), driven by a checkpointed Trigger.AvailableNow run.
This helper is that harness, extracted so sink/idempotency fixes apply to
every caller at once (price_pipeline keeps its own richer loop — state
store + notifications — by design).
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame


def drain_to_batch_dirs(
    spark: Any,
    stream_df: DataFrame,
    out_dir: str,
    ckpt_dir: str,
    *,
    output_mode: str,
    batch_shuffle_partitions: int | None = None,
    files_per_batch: int = 4,
) -> str:
    """Run ``stream_df`` to completion (AvailableNow) writing each
    micro-batch to ``<out_dir>/batch_id=N``; returns ``out_dir``.

    ``batch_shuffle_partitions`` pins ``spark.sql.shuffle.partitions`` for
    the drain (restored after) — for stateful streams the count is FROZEN
    into the checkpoint at first start and a restart with a different value
    is rejected by Spark, so size it for the target key cardinality up
    front."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.coalesce(files_per_batch).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )

    saved = spark.conf.get("spark.sql.shuffle.partitions")
    if batch_shuffle_partitions is not None:
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(batch_shuffle_partitions)
        )
    try:
        q = (
            stream_df.writeStream.outputMode(output_mode)
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
    return out_dir

"""The price pipeline: file-source readStream (JSON price events standing in
for the Kafka topic) → validity guards + scalar transforms → foreachBatch
that (a) appends to the `prices` time series, (b) merges the `crawl_state`
per-key watermark registry, and (c) emits change notifications.

Reference behavior re-expressed (file:line under /root/reference):
- readStream file watch = the 5s CSV-growth poll loop
  (tasks/steam_tasks_improved.py:221-253, ST5); `Trigger.AvailableNow`
  replaces the `_CRAWL_DONE.flag` completion sentinel (ST7,
  tasks/steam_tasks_improved.py:501-503); the checkpoint replaces
  `ProcessedTracker` JSON state (ST8, utils/common.py:52-125).
- prices append sink = per-message INSERT (S10,
  tasks/steam_tasks_improved.py:475-478), made set-oriented per micro-batch.
- crawl_state merge = ON DUPLICATE KEY UPDATE (ST1/A6/A7,
  tasks/steam_tasks_improved.py:481-485), as an associative
  struct-max + additive count merge so the final state is independent of
  micro-batch boundaries (exactly-once replay safe).
- change notifications = previous-price comparison + notify-on-diff (ST4,
  kafka/consumers/kafka_consumer_prices.py:37-67); the webhook POST
  (S16, tasks/steam_tasks_improved.py:687-729) becomes an append-only
  notifications table a side-effecting sink would drain.

Scale notes: every foreachBatch step is a keyed shuffle on appid (or an
append). The state table is read+merged+rewritten per batch — at 100 TB
state size the rewrite becomes the bottleneck and the table should be
bucketed by appid (or held in a merge-on-read format); the merge itself is
already associative, so nothing else changes.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalars import initial_price
from ..schemas import PRICE_EVENT

#: crawl_state columns maintained by the merge
_STATE_COLS = ("appid", "last_ts_us", "last_event_id", "last_price", "n_events")


def transform_price_events(raw: DataFrame) -> DataFrame:
    """Envelope → typed rows: validity guard (P9), µs event time recovered
    from the epoch-seconds double (error < 0.5 µs, so the round() is exact),
    and the F8 initial-price derivation."""
    guarded = raw.filter(
        (F.col("type") == "price")
        & F.col("appid").isNotNull()
        & F.col("event_id").isNotNull()
        & F.col("price").isNotNull()
        & F.col("timestamp").isNotNull()
    )
    return guarded.select(
        "appid",
        "event_id",
        "price",
        F.coalesce(F.col("discount"), F.lit(0.0)).alias("discount"),
        initial_price(
            F.col("price"), F.coalesce(F.col("discount"), F.lit(0.0))
        ).alias("initial_price"),
        F.round(F.col("timestamp") * 1000000).cast("long").alias("ts_us"),
    )


def _swap_in(df: DataFrame, target_dir: str, num_files: int = 4) -> None:
    """Write df to <target>.tmp then atomically replace <target> — the
    read-merge-overwrite step of an upsert without a mutable store.

    Coalesced: the state table is small relative to the stream, and it is
    re-read every micro-batch — 32 shuffle-partition files per rewrite is
    pure small-file churn (at real state sizes, raise num_files or bucket
    by the key instead)."""
    tmp = target_dir + ".tmp"
    df.coalesce(num_files).write.mode("overwrite").parquet(tmp)
    if os.path.exists(target_dir):
        shutil.rmtree(target_dir)
    os.rename(tmp, target_dir)


def merge_crawl_state(
    spark: SparkSession, state_dir: str, batch_df: DataFrame
) -> DataFrame:
    """Associative crawl_state merge: per appid keep the row of the max
    (ts, event_id) — a single struct-max aggregate — and add event counts.

    Because max and + are associative/commutative, the final state is the
    same for ANY partitioning of events into micro-batches, which is what
    makes the pipeline replay-safe and oracle-checkable.
    """
    batch_state = batch_df.groupBy("appid").agg(
        F.max(F.struct("last_ts_us", "last_event_id", "last_price")).alias("s"),
        F.sum("n_events").alias("n_events"),
    )
    if os.path.exists(state_dir):
        cur = spark.read.parquet(state_dir)
        both = cur.select(*_STATE_COLS).unionByName(
            batch_state.select(
                "appid",
                F.col("s.last_ts_us").alias("last_ts_us"),
                F.col("s.last_event_id").alias("last_event_id"),
                F.col("s.last_price").alias("last_price"),
                "n_events",
            )
        )
        batch_state = both.groupBy("appid").agg(
            F.max(F.struct("last_ts_us", "last_event_id", "last_price")).alias("s"),
            F.sum("n_events").alias("n_events"),
        )
    return batch_state.select(
        "appid",
        F.col("s.last_ts_us").alias("last_ts_us"),
        F.col("s.last_event_id").alias("last_event_id"),
        F.col("s.last_price").alias("last_price"),
        F.col("n_events").cast("long").alias("n_events"),
    )


def detect_changes(batch_df: DataFrame, prev_state: DataFrame | None) -> DataFrame:
    """ST4 change detection within a micro-batch: each event's previous price
    is the in-batch lag, falling back to the stored state for the first
    event per key. Events at or before the stored watermark are late data —
    they are dropped BEFORE the lag so they neither notify nor define 'the
    previous price' for on-time events (ST2 policy: the monotone state never
    regresses; late rows still land in the append-only prices table)."""
    if prev_state is not None:
        st = prev_state.select(
            "appid",
            F.col("last_ts_us").alias("st_ts_us"),
            F.col("last_price").alias("st_price"),
        )
        joined = batch_df.join(st, "appid", "left")
    else:
        joined = batch_df.withColumn("st_ts_us", F.lit(None).cast("long")).withColumn(
            "st_price", F.lit(None).cast("double")
        )
    on_time = joined.filter(
        F.col("st_ts_us").isNull() | (F.col("ts_us") > F.col("st_ts_us"))
    )
    w = Window.partitionBy("appid").orderBy("ts_us", "event_id")
    lagged = on_time.withColumn("prev_in_batch", F.lag("price").over(w))
    prev = F.coalesce(F.col("prev_in_batch"), F.col("st_price"))
    return (
        lagged.filter(prev.isNull() | (prev != F.col("price")))
        .select(
            "appid",
            "event_id",
            "ts_us",
            "price",
            prev.alias("prev_price"),
            F.when(prev.isNull(), F.lit("c")).otherwise(F.lit("u")).alias("op"),
        )
    )


def run_price_pipeline(
    spark: SparkSession,
    events_dir: str,
    work_dir: str,
    *,
    max_files_per_trigger: int | None = None,
) -> dict[str, str]:
    """Drain all available price-event files through the pipeline.

    Returns the output table paths: prices (append-only), crawl_state
    (merged registry), notifications (change stream). Re-running with the
    same work_dir resumes from the checkpoint: already-processed files are
    NOT reprocessed (exactly-once file progress).
    """
    prices_dir = os.path.join(work_dir, "prices")
    state_dir = os.path.join(work_dir, "crawl_state")
    notif_dir = os.path.join(work_dir, "notifications")
    ckpt_dir = os.path.join(work_dir, "checkpoint")

    reader = spark.readStream.schema(PRICE_EVENT)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    events = transform_price_events(reader.json(events_dir))

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            # S10: append-only prices time series.
            batch_df.write.mode("append").parquet(prices_dir)
            # ST4: notifications against the PRE-merge state.
            prev = (
                spark.read.parquet(state_dir)
                if os.path.exists(state_dir)
                else None
            )
            detect_changes(batch_df, prev).withColumn(
                "batch_id", F.lit(batch_id).cast("long")
            ).coalesce(4).write.mode("append").parquet(notif_dir)
            # ST1/A6/A7: merge the watermark registry.
            as_state = batch_df.select(
                "appid",
                F.col("ts_us").alias("last_ts_us"),
                F.col("event_id").alias("last_event_id"),
                F.col("price").alias("last_price"),
                F.lit(1).alias("n_events"),
            )
            _swap_in(merge_crawl_state(spark, state_dir, as_state), state_dir)
        finally:
            batch_df.unpersist()

    q = (
        events.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {"prices": prices_dir, "crawl_state": state_dir, "notifications": notif_dir}

"""Bucketed keyed state store for checkpointed foreachBatch merges.

The round-2 pipelines re-read, re-merged, and rewrote the ENTIRE state table
every micro-batch — correct (the merges are associative) but O(total state)
per batch: at 100× state the rewrite cost grows with lifetime state, not
batch size. This store is the partition-incremental replacement:

- State lives as ``<state_dir>/bucket=K/part-*.parquet`` with
  ``K = pmod(xxhash64(key…), num_buckets)`` — the same hash-partitioned
  layout a cluster deployment would use for co-located upserts.
- A batch only touches the buckets its keys hash into: merge cost is
  O(batch ∪ touched buckets); untouched bucket files are not read, not
  rewritten, and stay byte-identical (asserted in tests/test_streaming.py).
- Each bucket directory carries a ``_last_batch`` marker: the highest
  batch_id merged into it. foreachBatch delivery is at-least-once — after a
  crash the engine replays the in-flight batch — so every merge first drops
  buckets whose marker is already at/past the incoming batch_id. max-style
  fields are naturally idempotent; the marker makes ADDITIVE fields
  (n_events, n_reviews) replay-safe too. The marker file is written into the
  bucket's new directory BEFORE the atomic rename, so state content and its
  progress watermark can never disagree.

Reference semantics preserved: the merge itself is still the associative
struct-max / additive-count combination of tasks/steam_tasks_improved.py:
481-485 (ON DUPLICATE KEY UPDATE) — only the storage layout changed.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: marker file inside each bucket dir: highest batch_id merged into it.
#: The leading underscore keeps Spark's file listing from reading it as data.
MARKER = "_last_batch"

DEFAULT_NUM_BUCKETS = 16


def bucket_of(key_cols: list[str], num_buckets: int) -> Column:
    """The bucket id a key row hashes into (engine-internal — the salt never
    crosses engines, so xxhash64 is fine here)."""
    return F.pmod(
        F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(num_buckets)
    ).cast("int")


def _last_merged(bucket_dir: str) -> int:
    path = os.path.join(bucket_dir, MARKER)
    if os.path.exists(path):
        with open(path) as f:
            return int(f.read().strip())
    return -1


def read_state(
    spark: SparkSession, state_dir: str, buckets: list[int] | None = None
) -> DataFrame | None:
    """Read the merged state, or only ``buckets`` of it (partition-pruned:
    unlisted bucket directories are never opened). None when nothing exists
    yet."""
    if not os.path.isdir(state_dir):
        return None
    if buckets is None:
        names = [d for d in os.listdir(state_dir) if d.startswith("bucket=")]
    else:
        names = [f"bucket={b}" for b in buckets]
    paths = [
        os.path.join(state_dir, n)
        for n in names
        if os.path.isdir(os.path.join(state_dir, n))
    ]
    if not paths:
        return None
    # basePath keeps the bucket partition column when reading leaf dirs.
    return spark.read.option("basePath", state_dir).parquet(*paths)


def merge_bucketed(
    spark: SparkSession,
    state_dir: str,
    batch_state: DataFrame,
    key_cols: list[str],
    agg_exprs: list[Column],
    select_back: list,
    batch_id: int,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    touched: list[int] | None = None,
) -> None:
    """Merge one micro-batch's per-key rows into the store.

    ``batch_state`` must already be reduced to one row per key for this batch
    (its columns = the state schema). ``agg_exprs``/``select_back`` define the
    associative combine when a key already exists (e.g. struct-max +
    sum-of-counts). Only the buckets whose marker is behind ``batch_id`` are
    read, merged, and atomically swapped — one Spark job for all of them.
    ``touched`` skips the bucket probe when the caller already computed the
    batch's bucket set (e.g. for pre-merge notification reads).
    """
    bucketed = batch_state.withColumn("bucket", bucket_of(key_cols, num_buckets))
    if touched is None:
        touched = sorted(
            r.bucket for r in bucketed.select("bucket").distinct().collect()
        )
    pending = [
        b
        for b in touched
        if _last_merged(os.path.join(state_dir, f"bucket={b}")) < batch_id
    ]
    if not pending:
        return  # fully-replayed batch: every touched bucket already has it
    fresh = bucketed.filter(F.col("bucket").isin(pending))
    cur = read_state(spark, state_dir, pending)
    if cur is not None:
        merged = (
            cur.select(*fresh.columns)
            .unionByName(fresh)
            .groupBy("bucket", *key_cols)
            .agg(*agg_exprs)
            .select("bucket", *select_back)
        )
    else:
        merged = fresh

    tmp = f"{state_dir}.tmp-{batch_id}"
    (
        merged.repartition(len(pending), "bucket")
        .write.partitionBy("bucket")
        .mode("overwrite")
        .parquet(tmp)
    )
    os.makedirs(state_dir, exist_ok=True)
    for b in pending:
        src = os.path.join(tmp, f"bucket={b}")
        with open(os.path.join(src, MARKER), "w") as f:
            f.write(str(batch_id))
        dst = os.path.join(state_dir, f"bucket={b}")
        if os.path.exists(dst):
            shutil.rmtree(dst)
        os.rename(src, dst)
    shutil.rmtree(tmp, ignore_errors=True)

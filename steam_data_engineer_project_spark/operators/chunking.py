"""Document chunking and sequence packing for LLM training pipelines.

Two corpus-preparation operators every training-data pipeline needs between
"cleaned documents" and "training batches":

- :func:`chunk_documents`: split each document into fixed-size character
  windows with overlap (the standard long-document treatment before
  tokenization; context-window sizing happens downstream in token space).
  Pure JVM expressions — ``sequence`` → ``explode`` → ``substring`` — one
  narrow map stage, no Python, no shuffle.
- :func:`pack_sequences`: group short documents into token-budget bins
  ("sequence packing" — pad-to-max wastes FLOPs proportional to length
  variance; packing recovers them). Deterministic and partitioning-
  independent: documents route to shards by content hash and are binned by
  a running token total within their shard — ONE window shuffle, no
  driver-side bin state. A document that straddles a budget boundary stays
  in the bin where it started, so a bin can overflow by at most one
  document's tokens — the standard streaming-pack trade-off; exact
  first-fit would serialize the corpus through one sequential pass.

No reference counterpart (the reference never prepares training data);
engine-original surface. Both legs are oracle-verified in `fx_text_suite`
(the arithmetic is engine-portable md5 + integer expressions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .sampling import _hash_bucket


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_chars: int = 2048,
    overlap_chars: int = 256,
) -> DataFrame:
    """One row per (document, chunk): ``chunk_idx`` (0-based) and
    ``chunk_text`` = characters [idx·stride, idx·stride + chunk_chars) with
    ``stride = chunk_chars - overlap_chars``. Every character of the source
    is covered; consecutive chunks share ``overlap_chars`` characters so a
    span crossing a boundary appears whole in at least one chunk. NULL
    texts produce no rows (filter upstream if they should)."""
    if not 0 <= overlap_chars < chunk_chars:
        raise ValueError("need 0 <= overlap_chars < chunk_chars")
    stride = chunk_chars - overlap_chars
    n = F.greatest(
        F.lit(1),
        F.ceil((F.length(F.col(text_col)) - F.lit(overlap_chars)) / F.lit(stride)),
    ).cast("int")
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            F.explode(F.sequence(F.lit(0), n - 1)).alias("chunk_idx"),
            F.col(text_col),
        )
        .select(
            id_col,
            "chunk_idx",
            F.substring(
                F.col(text_col),
                (F.col("chunk_idx") * stride + 1).cast("int"),
                F.lit(chunk_chars),
            ).alias("chunk_text"),
        )
    )


def whitespace_token_count(text: Column) -> Column:
    """Whitespace token count — the cheap pre-tokenization size estimate
    packing budgets use (exact BPE counts come from the tokenizer service
    downstream; textstats.bpe_token_stats gives the regex-level bound)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    ).cast("long")


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int = 2048,
    num_shards: int = 64,
) -> DataFrame:
    """Assign every document a ``pack_id`` such that each pack's token total
    is ≈ ``budget`` (overflow bounded by one document — see module doc).

    Routing and order are pure content-hash functions of ``id_col``, so the
    packing is byte-stable under any partitioning, rerun, or engine — the
    property that makes packed training data reproducible. Documents
    LARGER than the budget get a pack of their own (the window arithmetic
    does this naturally). One shuffle (the per-shard window); shards bound
    each window partition at ~corpus/num_shards, so no global sort and no
    hot partition. Returns the input columns + ``pack_id`` (long).
    """
    shard = _hash_bucket(F.col(id_col), num_shards)
    order = _hash_bucket(F.col(id_col), 1 << 31)
    w = (
        Window.partitionBy(shard)
        .orderBy(order, F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(tokens_col)).over(w)
    bin_ = F.floor((cum - F.col(tokens_col)) / F.lit(budget))
    # shard stride 2^44: room for ~1.7e13 bins per shard (a 100 TB corpus at
    # budget 512 needs ~3e9) before ids could collide across shards, while
    # shard counts up to 2^19 stay inside the long. A 1e9 stride overflowed
    # into the next shard's id space at exactly the scale this operator
    # targets.
    return df.withColumn(
        "pack_id", (shard.cast("long") * F.lit(1 << 44) + bin_).cast("long")
    )

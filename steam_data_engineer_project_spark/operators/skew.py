"""Skew mitigation: salted two-phase aggregation and salted replicate joins.

AQE's skew-join handling (enabled in ``session.py``) splits oversized
shuffle partitions at runtime, but two cases still need explicit salting at
100 TB:

- a *single hot key* in a groupBy (one reducer gets the whole key no matter
  how AQE splits files) — fixed by aggregating on (key, salt) first, then
  combining the ``num_salts`` partials per key (both phases map-side
  combinable, so the hot key's rows never meet in one task until they are
  already reduced to ``num_salts`` rows);
- a hot key on the BIG side of a non-broadcastable join — fixed by salting
  the big side and replicating the small side across all salts (an explicit
  broadcast-style fan-out that keeps each (key, salt) bucket bounded).

Both transformations are exact for decomposable aggregates (sum / count /
min / max and avg as sum÷count) and inner equi-joins — verified against the
unsalted plans by the ``skew_salted_agg`` oracle query and unit tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, MapType, StructType

_SALT = "__salt"


def _contains_map(dt) -> bool:
    """True when a map occurs anywhere in the type tree — Spark rejects
    hash inputs with maps at ANY nesting depth, not just at the top."""
    if isinstance(dt, MapType):
        return True
    if isinstance(dt, ArrayType):
        return _contains_map(dt.elementType)
    if isinstance(dt, StructType):
        return any(_contains_map(f.dataType) for f in dt.fields)
    return False


def _salt_col(df: DataFrame, num_salts: int) -> Column:
    """Retry-stable salt in [0, num_salts): xxhash64 over the row's hashable
    columns MIXED WITH the input partition id.

    - Content hashing makes a retried map task re-emit every row under the
      same salt — mandatory on a shuffle key (rand() /
      monotonically_increasing_id can re-assign rows between attempts after
      a fetch failure, double-counting or dropping them downstream).
    - ``spark_partition_id()`` spreads a hot key of BYTE-IDENTICAL rows
      across input partitions instead of collapsing them all onto one salt;
      it is deterministic per task attempt as long as the upstream
      partitioning is (file scans are — the same split always becomes the
      same partition). Identical rows within one input partition still share
      a salt, which is bounded by maxPartitionBytes rather than by the hot
      key's total size.
    - Columns containing a map ANYWHERE in their type (top-level, inside a
      struct, or as an array element) are excluded — Spark forbids maps in
      any hash input, not just at the top. Column names are backtick-quoted
      (with `` escaped) so dotted names resolve literally instead of
      parsing as nested fields.
    """
    hashable = [
        F.col("`" + c.replace("`", "``") + "`")
        for c in df.columns
        if not _contains_map(df.schema[c].dataType)
    ]
    return F.pmod(
        F.xxhash64(*hashable, F.spark_partition_id()), F.lit(num_salts)
    )


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    *,
    sums: list[str] | None = None,
    mins: list[str] | None = None,
    maxs: list[str] | None = None,
    count: str | None = None,
    num_salts: int = 16,
) -> DataFrame:
    """Two-phase groupBy immune to a single hot key.

    Phase 1 aggregates on (keys…, salt) — the hot key is spread over
    ``num_salts`` reducers; phase 2 combines the per-salt partials on the
    real keys (sum of sums, min of mins, max of maxs, sum of counts). The
    salt is retry-stable content+partition hashing — see :func:`_salt_col`
    for the guarantees (and why byte-identical duplicate rows no longer
    collapse onto a single salt).

    ``count`` names the output column for ``COUNT(*)`` when set. Output
    columns keep their input names; count gets ``count``'s value as name.
    """
    sums = list(sums or [])
    mins = list(mins or [])
    maxs = list(maxs or [])
    phase1 = [F.sum(c).alias(f"__s_{c}") for c in sums]
    phase1 += [F.min(c).alias(f"__mn_{c}") for c in mins]
    phase1 += [F.max(c).alias(f"__mx_{c}") for c in maxs]
    if count:
        phase1.append(F.count(F.lit(1)).alias("__cnt"))
    partial = df.withColumn(_SALT, _salt_col(df, num_salts)).groupBy(
        *keys, _SALT
    ).agg(*phase1)
    phase2 = [F.sum(f"__s_{c}").alias(c) for c in sums]
    phase2 += [F.min(f"__mn_{c}").alias(c) for c in mins]
    phase2 += [F.max(f"__mx_{c}").alias(c) for c in maxs]
    if count:
        phase2.append(F.sum("__cnt").alias(count))
    return partial.groupBy(*keys).agg(*phase2)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join a skewed big side to a small (but not broadcastable) side.

    The big side gets a cycling row salt; the small side is exploded across
    all ``num_salts`` salt values, so every (key, salt) shuffle bucket holds
    ~1/num_salts of a hot key's rows. Exact ONLY for inner/left joins (every
    big row keeps exactly its original match set); right/full outer would
    duplicate each unmatched small-side row num_salts times, so those are
    rejected.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join is exact only for inner/left joins, got how={how!r}"
        )
    # Retry-stable content+partition salt (see _salt_col): identical
    # duplicate big-side rows spread across input partitions too.
    b = big.withColumn(_SALT, _salt_col(big, num_salts))
    s = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)).cast("array<bigint>"))
    )
    return b.join(s, on + [_SALT], how).drop(_SALT)

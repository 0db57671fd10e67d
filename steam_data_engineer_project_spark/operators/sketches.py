"""Deterministic cardinality sketches.

At 100 TB, `COUNT(DISTINCT x)` per group is a full shuffle of every
distinct value; the standard fix is a bounded-size sketch. Spark ships
HyperLogLog++ (`approx_count_distinct`), but its estimate is
engine-private — no other system reproduces the exact number, so it can't
be oracle-verified and two runs of a pipeline on different engines won't
agree. The K-minimum-values (KMV) sketch (Bar-Yossef et al. 2002, public
literature) fixes that here:

- hash every distinct value to a uniform 52-bit integer (first 13 md5 hex
  digits of ``'v:' || value`` — the same engine-portable md5 trick as
  operators/sampling);
- keep each group's k smallest distinct hashes (one per-group window —
  the same single-shuffle shape as any per-key top-k, and Spark's
  WindowGroupLimit prunes to k per partition BEFORE the shuffle, so the
  exchange carries ≤ k·partitions rows per group, not the distinct set);
- estimate |distinct| = (k−1)·2⁵² DIV h_k (integer division of exact
  integers — NO floating point anywhere, so the estimate is bit-identical
  on every engine and the DuckDB oracle replays it exactly). Groups with
  fewer than k distinct values report their exact count.

Standard error ≈ 1/√(k−2) (~12.7% at k=64); k is the accuracy/size knob.
Sketches merge by unioning hash sets and re-taking the k smallest — the
map-side-combine property that makes this work as a distributed
aggregate.

No reference counterpart — engine-original (SURVEY.md §2.12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: 2^52 — the hash domain size; 13 hex digits.
_KMV_DOMAIN = 1 << 52


def kmv_distinct_estimate(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group KMV distinct-count estimate: (group, est_distinct,
    sketch_size). ``sketch_size`` < k means the group was exact-counted.
    NULL values are ignored (SQL COUNT(DISTINCT) semantics)."""
    hv = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("v:"), F.col(value_col).cast("string"))), 1, 13
        ),
        16,
        10,
    ).cast("long")
    d = (
        df.select(group_col, value_col)
        .where(F.col(value_col).isNotNull())
        .distinct()
        .withColumn("__h", hv)
    )
    w = Window.partitionBy(group_col).orderBy("__h", value_col)
    topk = d.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k
    )
    est = F.when(F.col("m") < k, F.col("m")).otherwise(
        F.expr(f"CAST({k - 1} AS BIGINT) * CAST({_KMV_DOMAIN} AS BIGINT) DIV hk")
    )
    return (
        topk.groupBy(group_col)
        .agg(F.count("*").alias("m"), F.max("__h").alias("hk"))
        .select(
            group_col,
            est.cast("long").alias("est_distinct"),
            F.col("m").cast("long").alias("sketch_size"),
        )
    )


def kmv_sketch(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Materialize the per-group KMV SKETCH itself — (group, kmv_h) rows,
    the ≤ k smallest distinct 52-bit value hashes per group — the form a
    pipeline STORES (one tiny table per corpus shard / day) so cardinalities
    can later be combined WITHOUT rescanning the data. Same hash family and
    window shape as :func:`kmv_distinct_estimate`; the sketch keeps hashes
    only (the estimate never needs values), which is what makes two
    sketches of the same value collapse under the merge's DISTINCT."""
    hv = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("v:"), F.col(value_col).cast("string"))), 1, 13
        ),
        16,
        10,
    ).cast("long")
    d = (
        df.select(group_col, value_col)
        .where(F.col(value_col).isNotNull())
        .distinct()
        .select(group_col, hv.alias("kmv_h"))
        .distinct()
    )
    w = Window.partitionBy(group_col).orderBy("kmv_h")
    return (
        d.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(group_col, "kmv_h")
    )


def kmv_merge(
    sketches: list[DataFrame],
    group_col: str,
    k: int = 64,
) -> DataFrame:
    """Merge stored KMV sketches: union the hash sets, drop duplicates, and
    re-take each group's k smallest — the mergeability that is the sketch's
    whole selling point (a distributed COUNT DISTINCT that composes across
    shards/days with k-row-per-group traffic, never a rescan). The merged
    sketch of A ∪ B is IDENTICAL to the sketch built directly on A ∪ B
    (min-k of a union = min-k of the union of min-k's), so estimates agree
    exactly — pinned by the equivalence test. All ``sketches`` must share
    the same k (a larger-k sketch can always be downsampled by this same
    function; merging a SMALLER-k sketch would under-estimate silently, so
    pass the k the smallest sketch was built with)."""
    if not sketches:
        raise ValueError("kmv_merge needs at least one sketch")
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    w = Window.partitionBy(group_col).orderBy("kmv_h")
    return (
        u.distinct()
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(group_col, "kmv_h")
    )


def kmv_estimate_from_sketch(
    sketch: DataFrame,
    group_col: str,
    k: int = 64,
) -> DataFrame:
    """(group, est_distinct, sketch_size) from a stored/merged sketch —
    the same all-integer (k−1)·2⁵² DIV h_k estimator as
    :func:`kmv_distinct_estimate`, exact count for groups whose sketch
    never filled (size < k)."""
    est = F.when(F.col("m") < k, F.col("m")).otherwise(
        F.expr(f"CAST({k - 1} AS BIGINT) * CAST({_KMV_DOMAIN} AS BIGINT) DIV hk")
    )
    return (
        sketch.groupBy(group_col)
        .agg(F.count("*").alias("m"), F.max("kmv_h").alias("hk"))
        .select(
            group_col,
            est.cast("long").alias("est_distinct"),
            F.col("m").cast("long").alias("sketch_size"),
        )
    )


def kmv_row_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int = 256,
    *,
    check_unique: bool = False,
) -> DataFrame:
    """Per-group deterministic uniform row sample: the rows whose 52-bit
    ``md5('r:' || key)`` hash is among the group's k smallest. The same
    min-k-of-hashes shape as :func:`kmv_sketch`, applied to ROW KEYS
    instead of values — so the sample is (a) uniform (md5 is a uniform
    map), (b) engine-exact (any engine with md5 picks the identical rows),
    and (c) MERGEABLE: min-k of a union = min-k of the union of min-k's,
    so sampling shards independently and re-taking the k smallest yields
    bit-identical rows to sampling the union directly — pinned by the
    equivalence test.

    One window shuffle on the group key; WindowGroupLimit prunes each
    partition to k rows BEFORE the exchange, so the shuffle carries
    ≤ k·partitions rows per group regardless of group size. Keeps all
    input columns plus the hash (``__kmv_rh``) for downstream re-merging.

    PRECONDITION: ``key_col`` must be unique per row (the same contract
    :func:`kmv_merge` states for k). Duplicate keys tie on
    (``__kmv_rh``, key) — row selection among the tied copies becomes
    partition-order-dependent, and the tied rows inflate the sample past
    one-per-key — so deduplicate on the key upstream (or pick a truly
    unique key) before sampling.

    ``check_unique=True`` turns that silent wrong-sample into a LOUD
    error: a plan-embedded ``assert_true`` compares each row's key to its
    window predecessor (duplicates within a group are adjacent under the
    (hash, key) order, and cross-group duplicates never tie), raising at
    execution time on the first violation. The check rides the window
    the sampler already shuffles on, but the unbounded ``lag`` disables
    the WindowGroupLimit pre-shuffle prune — a debug/validation flag,
    not the steady-state default.
    """
    rh = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("r:"), F.col(key_col).cast("string"))), 1, 13
        ),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy(group_col).orderBy("__kmv_rh", key_col)
    out = df.withColumn("__kmv_rh", rh).withColumn(
        "__rn", F.row_number().over(w)
    )
    if check_unique:
        # assert_true returns NULL on pass ⇒ the isNull filter keeps every
        # valid row, so the assert is load-bearing (column pruning can't
        # drop it); projected first because window exprs can't sit in a
        # WHERE clause directly.
        dup = F.lag(F.col(key_col)).over(w) == F.col(key_col)
        out = (
            out.withColumn(
                "__kmv_chk",
                F.assert_true(
                    ~F.coalesce(dup, F.lit(False)),
                    F.concat(
                        F.lit(
                            "kmv_row_sample: duplicate key in group — "
                            f"{key_col}="
                        ),
                        F.col(key_col).cast("string"),
                    ),
                ),
            )
            .filter(F.col("__kmv_chk").isNull())
            .drop("__kmv_chk")
        )
    return out.filter(F.col("__rn") <= k).drop("__rn")


def sampled_group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    key_col: str,
    quantiles: list[float],
    k: int = 256,
) -> DataFrame:
    """APPROXIMATE per-group quantiles — exact PERCENTILE_DISC rank math
    (the same ⌈q·n⌉ integer selection as textstats.group_quantiles) over
    a :func:`kmv_row_sample` instead of the full group. Returns
    (group, q_ppm, q_value, q_key, sample_n): the selected value is an
    actual sampled document's, and sample_n < k marks groups that were
    computed exactly (the whole group fit the sample).

    Why this and not Spark's ``approx_percentile``: Greenwald-Khanna's
    summary depends on arrival order, so its answer is engine-private and
    cannot be oracle-verified or reproduced across engines. The sampled
    quantile's error is instead a SAMPLING bound — the rank of the
    sample's q-quantile deviates by O(1/√k) in quantile space (~±6% of
    rank at k=256, shrinking as 1/√k) — while staying bit-deterministic:
    same corpus, same k ⇒ same answer on every engine.

    At 100 TB this replaces a full per-group sort shuffle with the
    pruned k-row-per-group exchange of the sample, and stored samples
    merge across shards/days (union, re-take min-k) without rescanning —
    the property exact quantiles fundamentally lack."""
    from .textstats import group_quantiles

    s = kmv_row_sample(
        df.select(group_col, value_col, key_col), group_col, key_col, k
    )
    n = s.groupBy(group_col).agg(F.count("*").cast("long").alias("sample_n"))
    q = group_quantiles(
        s.select(group_col, value_col, key_col),
        group_col,
        value_col,
        key_col,
        quantiles,
    )
    return q.join(F.broadcast(n), group_col)


def kmv_row_sample_merge(
    samples: list[DataFrame],
    group_col: str,
    key_col: str,
    k: int = 256,
) -> DataFrame:
    """Merge stored :func:`kmv_row_sample` outputs from disjoint shards:
    union, re-take each group's k smallest row hashes. Identical rows to
    sampling the union directly (min-k of a union = min-k of the union of
    min-k's — same argument as :func:`kmv_merge`), so quantile summaries
    computed from stored shard samples agree exactly with a full rescan.
    All inputs must carry the ``__kmv_rh`` column their sampler added and
    share the same (or larger) k."""
    if not samples:
        raise ValueError("kmv_row_sample_merge needs at least one sample")
    u = samples[0]
    for s in samples[1:]:
        u = u.unionByName(s)
    w = Window.partitionBy(group_col).orderBy("__kmv_rh", key_col)
    return (
        u.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )

"""Similarity search over embedding columns (array<float>).

- brute_force_cosine_topk: exact top-k by cosine similarity against a query
  vector. The dot product / norms are built-in higher-order functions
  (``aggregate`` / ``zip_with``) — JVM-side, no Python. The query vector is a
  literal broadcast into the plan, so the scan is embarrassingly parallel and
  the only shuffle is the final global top-k (a TakeOrderedAndProject, which
  does per-partition top-k then merges k·p rows on the driver — safe at any
  scale for small k).

- lsh_bucket_cosine_topk: sign-projection LSH prefilter. Each vector gets a
  bucket id from the signs of ``n_planes`` chosen coordinates (axis-aligned
  hyperplanes — deterministic, engine-portable); only vectors in the query's
  bucket are scored. At scale this turns a full scan into a partition-prunable
  predicate if the table is written bucketed/partitioned by the LSH bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_cosine_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec: list[float],
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k against a literal query vector.

    Returns (id_col, cosine) with the k most similar rows, ties broken by id
    for determinism.
    """
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = df.select(
        F.col(id_col), F.round(cosine_similarity(F.col(vec_col), q), 6).alias("cosine")
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def lsh_bucket_id(vec: Column, n_planes: int = 8, stride: int = 7) -> Column:
    """Sign-projection LSH bucket: bit j = (vec[(j*stride) % dim] > 0).

    Axis-aligned planes with a coprime stride give a deterministic,
    engine-portable 2^n_planes-bucket partitioning (a degenerate but valid
    member of the random-hyperplane family; full random planes would be a
    literal matrix built the same way). The modulus is the vector's own
    length (``size(vec)``), so any embedding dimension works — the data-side
    and query-side bucket computations must agree on it.
    """
    dim = F.size(vec)
    bits = [
        F.when(
            F.element_at(
                vec, (F.lit(j * stride) % dim + F.lit(1)).cast("int")
            ).cast("double")
            > 0.0,
            F.lit(1 << j),
        ).otherwise(F.lit(0))
        for j in range(n_planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def query_bucket_id(
    query_vec: list[float], n_planes: int = 8, stride: int = 7
) -> int:
    """Python-side mirror of :func:`lsh_bucket_id` for a literal query vector.

    Uses the same ``% len(vec)`` modulus as the Column version so data-side
    and query-side buckets always agree, at any embedding dimension.
    """
    bucket = 0
    for j in range(n_planes):
        if float(query_vec[(j * stride) % len(query_vec)]) > 0.0:
            bucket += 1 << j
    return bucket


def lsh_bucket_cosine_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    probe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k: score only vectors in buckets within
    ``probe_hamming`` bit flips of the query's LSH bucket (multi-probe —
    Hamming-1 probing recovers most neighbors lost to a single sign flip at
    the cost of ``n_planes``× more candidate buckets out of ``2^n_planes``).

    Returns (id_col, bucket, cosine). On a table written bucketed/partitioned
    by the LSH id the bucket predicate prunes the scan; here it prunes
    compute.
    """
    q_bucket = query_bucket_id(query_vec, n_planes)
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    bucketed = df.select(
        F.col(id_col),
        F.col(vec_col),
        lsh_bucket_id(F.col(vec_col), n_planes).alias("bucket"),
    ).filter(
        F.bit_count(F.col("bucket").bitwiseXOR(F.lit(q_bucket))) <= probe_hamming
    )
    scored = bucketed.select(
        F.col(id_col),
        "bucket",
        F.round(cosine_similarity(F.col(vec_col), q), 6).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)

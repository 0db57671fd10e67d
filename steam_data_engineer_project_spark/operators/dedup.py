"""Deduplication operators for large-scale corpora.

All operators are pure DataFrame compositions — shuffles only where the
semantics require them (groupBy on a hash key, or an inverted-index
self-join), no Python UDFs in the hot path:

- exact_dedup:          hash-groupBy; one shuffle on the content hash.
- ngram_jaccard_pairs:  word-shingle inverted index self-join; shuffle on the
                        shingle key (small), never a cartesian product.
- minhash_signatures /
  minhash_lsh_candidates: MinHash over shingles with md5-derived hash
                        families, banded LSH bucketing; candidate pairs come
                        from a bucket equi-join, so the cost scales with
                        bucket collision counts, not n².
- simhash_fingerprints: 64-bit SimHash from per-token md5 bits.

At 100 TB: every stage is a scan + a keyed shuffle whose key cardinality is
large (hash/shingle/bucket), so there is no driver-side state and skew only
appears for pathological shingles (stopword-only shingles are the classic
case — callers can pre-filter; LSH band hashing redistributes them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _normalized(col):
    """Canonical text form used for content hashing: lowercase, collapsed
    whitespace, trimmed."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact near-literal dedup: md5 over normalized text, keep the lowest id
    per content group.

    Returns (id_col, text_hash, n_copies) with one row per distinct content.
    One shuffle (groupBy text_hash); partial aggregation is map-side.
    """
    hashed = df.select(
        F.col(id_col), F.md5(_normalized(F.col(text_col))).alias("text_hash")
    )
    return hashed.groupBy("text_hash").agg(
        F.min(id_col).alias(id_col), F.count("*").alias("n_copies")
    ).select(id_col, "text_hash", "n_copies")


def _word_shingles(text_col, n: int = 3):
    """Array of n-word shingles (space-joined) from normalized text.

    Built-in expression only: split -> sliding join via transform over
    index sequence.
    """
    tokens = F.split(_normalized(text_col), " ")
    k = F.greatest(F.size(tokens) - (n - 1), F.lit(0))
    # indexes 0..k-1; shingle i = tokens[i..i+n-1] joined by ' '
    idx = F.sequence(F.lit(0), k - 1)
    return F.when(k <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(tokens, (i + j + 1).cast("int")) for j in range(n)]
            ),
        )
    )


def shingle_table(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """Exploded distinct (id, shingle) pairs — the inverted-index input."""
    return (
        df.select(F.col(id_col), F.explode(_word_shingles(F.col(text_col), n)).alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    n: int = 3,
    min_shared: int = 2,
    min_jaccard: float = 0.0,
) -> DataFrame:
    """Candidate near-duplicate pairs by n-word-shingle Jaccard similarity.

    Inverted-index formulation: explode shingles, self-join on the shingle,
    count shared shingles per (a, b) pair with a < b, then
    ``jaccard = shared / (|A| + |B| - shared)``. The self-join shuffles on the
    shingle key — never materializes the n² pair space; only pairs that share
    at least one shingle appear, and `min_shared` prunes the long tail early.

    Returns (id_a, id_b, shared_shingles, jaccard) rounded to 6 places.
    """
    # No cache(): the shingle explode is cheap to recompute and an uncached
    # plan lets AQE size both consumers independently; a cache here would
    # also leak executor memory across repeated invocations (bench loops).
    sh = shingle_table(df, text_col, id_col, n)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))

    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    shared = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("shared_shingles"))
        .filter(F.col("shared_shingles") >= min_shared)
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    out = (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("shared_shingles")
                / (F.col("n_a") + F.col("n_b") - F.col("shared_shingles")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "shared_shingles", "jaccard")
    )
    return out


def _md5_long(col, salt: int):
    """Deterministic 60-bit hash from md5(salt || value) — portable across
    engines (hex prefix -> bigint) and stable across Spark versions, unlike
    ``hash()``/``xxhash64`` whose seeds are engine-specific."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"s{salt}:"), col)), 1, 15), 16, 10
    ).cast("long")


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    n: int = 3,
    num_hashes: int = 32,
) -> DataFrame:
    """MinHash signature per document: for each of ``num_hashes`` salted md5
    hash functions, the minimum hash over the document's word shingles.

    Returns (id_col, sig: array<long> of length num_hashes). Documents with
    no shingles (too short) are dropped.

    One explode + one groupBy(id) shuffle; the per-hash minimums are computed
    with map-side partial aggregation.
    """
    sh = shingle_table(df, text_col, id_col, n)
    mins = sh.groupBy(id_col).agg(
        *[
            F.min(_md5_long(F.col("shingle"), i)).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    )
    return mins.select(
        F.col(id_col), F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    min_jaccard_est: float = 0.0,
) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash LSH.

    Signatures are split into ``bands`` bands of ``num_hashes // bands`` rows;
    a pair is a candidate iff it collides in at least one band (equi-join on
    (band_id, band_hash)). The estimated Jaccard is the fraction of matching
    signature positions.

    Returns (id_a, id_b, est_jaccard). Shuffles: groupBy(id) for signatures,
    then an equi-join keyed on the band hash — at scale the band hash space
    is huge, so buckets stay small and the join never degenerates.
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, n=n, num_hashes=num_hashes)

    banded = sigs.select(
        F.col(id_col),
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.md5(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("sig", b * rows_per_band + r + 1)
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select(F.col(id_col), "sig", "band.band_id", "band.band_hash")

    a = banded.select(
        F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"), "band_id", "band_hash"
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"), "band_id", "band_hash"
    )
    pairs = (
        a.join(b, ["band_id", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .distinct()
    )
    est = pairs.withColumn(
        "est_jaccard",
        F.round(
            F.size(
                F.filter(
                    F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                    lambda m: m,
                )
            )
            / F.lit(num_hashes),
            6,
        ),
    )
    return est.filter(F.col("est_jaccard") >= min_jaccard_est).select(
        "id_a", "id_b", "est_jaccard"
    )


def simhash_fingerprints(
    df: DataFrame, text_col: str, id_col: str, *, bits: int = 64
) -> DataFrame:
    """64-bit SimHash per document from per-token md5 bits.

    For each distinct token, md5 gives 64 bits; each bit contributes +1/-1 to
    its position; the fingerprint sets bit i iff the sum is positive.
    Near-duplicates are fingerprints within small Hamming distance.

    Returns (id_col, simhash: long, n_tokens: long). Pure expressions: the
    per-document bit-vote is an explode + groupBy(id) aggregation.
    """
    assert bits <= 64
    tokens = (
        df.select(
            F.col(id_col),
            F.explode(F.split(_normalized(F.col(text_col)), " ")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .distinct()
    )
    # md5 hex -> per-bit votes. Bit i lives in hex digit i//4, mask 8>>(i%4).
    hexd = tokens.withColumn("h", F.md5("tok"))
    votes = hexd.select(
        F.col(id_col),
        *[
            (
                F.when(
                    (
                        F.conv(F.substring("h", 1 + i // 4, 1), 16, 10).cast("int")
                        .bitwiseAND(F.lit(8 >> (i % 4)))
                    )
                    > 0,
                    F.lit(1),
                )
                .otherwise(F.lit(-1))
                .alias(f"b{i}")
            )
            for i in range(bits)
        ],
    )
    summed = votes.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        *[F.sum(f"b{i}").alias(f"b{i}") for i in range(bits)],
    )
    from functools import reduce

    bit_cols = [
        F.when(
            F.col(f"b{i}") > 0,
            F.shiftleft(F.lit(1).cast("long"), bits - 1 - i),
        ).otherwise(F.lit(0).cast("long"))
        for i in range(bits)
    ]
    fp = summed.select(
        F.col(id_col),
        reduce(lambda acc, c: acc.bitwiseOR(c), bit_cols, F.lit(0).cast("long")).alias(
            "simhash"
        ),
        "n_tokens",
    )
    return fp

"""Connected components over near-duplicate pair edges.

The dedup operators (dedup.py, similarity.py) emit candidate PAIRS; a
training-data pipeline must collapse them into CLUSTERS (keep one canonical
document per component, or route whole components to one side of a
train/test split — see operators/sampling.deterministic_split — so
near-duplicates can never straddle the split and leak).

Spark has no built-in CC; this is Pregel-style iterative min-label
propagation expressed in DataFrame ops: every node starts labeled with its
own id, each round adopts the minimum label among itself and its neighbors,
and the loop stops when a round changes nothing. Convergence is
O(component diameter) rounds — near-dup clusters are dense and shallow
(diameter ≤ ~4), so a handful of shuffles on the edge key ends it. Each
round ``localCheckpoint``s its labels: iterative self-referencing plans
grow EXPONENTIALLY in lineage (each round embeds the previous plan twice),
so truncation per round is correctness-of-operation, not a tuning detail —
on a cluster use reliable ``checkpoint()`` to HDFS for fault tolerance.
For adversarially deep graphs at scale, swap in the alternating-star
"large-star/small-star" contraction (same DataFrame shapes, logarithmic
rounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; the
    component id is the minimum node id in the component. Deterministic,
    partitioning-independent."""
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).union(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    sym = (
        sym.filter(F.col("a") != F.col("b")).distinct().localCheckpoint()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )

    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a")
            .agg(F.min("label").alias("nbr_min"))
        )
        # Carry the previous label through the checkpoint so the convergence
        # check is a filter over already-materialized data — no extra join,
        # and type-agnostic (works for string node ids, unlike a label-sum).
        new_labels = (
            labels.join(nbr_min, labels.node == nbr_min.a, "left")
            .select(
                "node",
                F.least(
                    F.col("label"),
                    F.coalesce(F.col("nbr_min"), F.col("label")),
                ).alias("label"),
                F.col("label").alias("prev"),
            )
            .localCheckpoint()
        )
        changed = new_labels.filter(F.col("label") < F.col("prev")).limit(1).count()
        labels = new_labels.drop("prev")
        if changed == 0:
            break
    return labels.select(F.col("node"), F.col("label").alias("component"))


def canonical_per_component(
    components: DataFrame, node_col: str = "node", comp_col: str = "component"
) -> DataFrame:
    """One row per component: its minimum node id as the canonical
    representative (matches the component id by construction)."""
    return components.groupBy(comp_col).agg(
        F.min(node_col).alias("canonical")
    )

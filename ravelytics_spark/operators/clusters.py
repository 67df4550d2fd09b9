"""Connected components over near-duplicate pair edges — turns pairwise
similarity output (``minhash_dedup_pairs``, ``simhash_near_pairs``,
``embedding_near_pairs``) into transitive duplicate CLUSTERS, so
"a≈b, b≈c" dedups to one survivor even when (a,c) was never a candidate
pair.

Algorithm: iterative hash-min label propagation (the standard
large-graph CC on data-parallel engines; alternating small-star/big-star
is the published refinement). Each node's label starts as itself; each
round every node takes the min label in its neighborhood; converged when
no label changes. Rounds = O(graph diameter) — near-dup graphs are
shallow (dup clusters are cliques-ish), so 3-5 rounds suffice in
practice.

The loop is driver-controlled but the work per round is one
shuffle (groupBy node); ``localCheckpoint`` truncates the growing
lineage so round N doesn't re-execute rounds 1..N-1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    max_iterations: int = 20,
) -> DataFrame:
    """(node, component) for every node in the (id_a, id_b) edge list;
    component = min node id in the connected component.

    Raises ``RuntimeError`` if labels are still changing after
    ``max_iterations`` rounds: a partially-propagated result has WRONG
    component ids (one real component reported as several), which for
    dedup means silently keeping duplicates. Rounds needed ≈ graph
    diameter; near-dup graphs are clique-ish and converge in 3-5, so
    hitting 20 means the edge list isn't the expected shape (e.g. a
    long-chain graph — raise the budget explicitly if that's real)."""
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
    )
    labels = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("component")
    )

    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nbr_component", F.col("component"))
                ).alias("component"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "rounds; a partial result would mislabel components (and "
            "under-dedup). Increase max_iterations for high-diameter graphs."
        )
    return labels


def dedup_by_clusters(df: DataFrame, pairs: DataFrame, id_col: str) -> DataFrame:
    """Drop every row whose id belongs to a near-dup cluster but is not
    the cluster's minimum id (transitive version of the pairwise
    keep-lowest rule)."""
    comp = connected_components(pairs)
    losers = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")

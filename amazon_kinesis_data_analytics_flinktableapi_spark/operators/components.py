"""Connected components over a pair/edge list — the dedup-clustering step:
near-dup PAIRS (from jaccard/minhash/simhash/embedding ops) become CLUSTERS,
and each cluster keeps one canonical document.

Algorithm: iterative min-label propagation (the standard shared-nothing CC
formulation): every node starts labeled with itself; each round every node
takes the min label in its neighborhood; converged when no label changes.
Rounds = O(component diameter) — near-dup graphs are unions of small
cliques, so 2-4 rounds in practice.  Each round is one shuffle on node id;
no driver-side graph state (only a scalar convergence count crosses to the
driver).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """(node, component) — component = min node id reachable.

    ``edges`` is an undirected pair list; isolated nodes absent from it are
    their own components by definition (add them downstream if needed).
    """
    bidir = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .cache()
    )
    labels = (
        bidir.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .cache()
    )
    cached_round = labels
    for _ in range(max_iterations):
        neighbor_min = (
            bidir.join(labels, bidir["v"] == labels["node"])
            .groupBy(F.col("u").alias("node"))
            .agg(F.min("comp").alias("nmin"))
        )
        # one materialization per round: carry the changed flag alongside
        # the new label, so convergence is a filter-count over the cached
        # round result instead of a second old-vs-new join
        merged = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce(F.col("nmin"), F.col("comp"))).alias("comp"),
                (F.coalesce(F.col("nmin") < F.col("comp"), F.lit(False))).alias("__changed"),
            )
            .cache()
        )
        changed = merged.filter(F.col("__changed")).count()
        cached_round.unpersist()
        cached_round = merged
        labels = merged.select("node", "comp")
        if changed == 0:
            break
    bidir.unpersist()
    return labels


def dedup_clusters(pairs: DataFrame, all_ids: DataFrame, id_col: str) -> DataFrame:
    """(id, cluster_id): cluster = min doc id in the near-dup component;
    ids with no near-dup edge are singleton clusters of themselves.
    ``keep = (id == cluster_id)`` picks one canonical doc per cluster."""
    comps = connected_components(pairs)
    return (
        all_ids.select(F.col(id_col))
        .join(comps.withColumnRenamed("node", id_col), id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("comp"), F.col(id_col)).alias("cluster_id"),
        )
    )

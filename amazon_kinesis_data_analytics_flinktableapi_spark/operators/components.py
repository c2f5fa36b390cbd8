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

Iteration mechanics (the r1 weak spot, ~25 s at sf0.1 for tiny graphs):
- ``localCheckpoint`` after each materialization truncates lineage, so
  analysis/planning cost stays constant per round instead of growing with
  the accumulated plan (the dominant cost at small data).
- Two propagation steps run lazily between materializations: a no-change
  *last* step still proves convergence, so checking every 2nd round is
  exact, not a heuristic.
- No cached DataFrame escapes: checkpointed blocks are released by Spark's
  ContextCleaner when the returned DataFrame is garbage collected (callers
  need no unpersist discipline).
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 20,
    check_every: int = 2,
) -> DataFrame:
    """(node, component) — component = min node id reachable.

    ``edges`` is an undirected pair list; isolated nodes absent from it are
    their own components by definition (add them downstream if needed).
    Warns (and returns the partial labels) if ``max_iterations`` is
    exhausted before convergence — only possible when a component's
    diameter exceeds ``max_iterations``, which near-dup clique unions
    never approach.
    """
    # materialize the edge list BEFORE mirroring it: union(e, e.swap) runs
    # its input subplan twice, and the input here is typically the whole
    # near-dup pair pipeline (the expensive part)
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).localCheckpoint()
    bidir = (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint()  # every round joins against it
    )
    labels = (
        bidir.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
    )

    def step(lbl: DataFrame) -> DataFrame:
        neighbor_min = (
            bidir.join(lbl, bidir["v"] == lbl["node"])
            .groupBy(F.col("u").alias("node"))
            .agg(F.min("comp").alias("nmin"))
        )
        return lbl.join(neighbor_min, "node", "left").select(
            "node",
            F.least(F.col("comp"), F.coalesce(F.col("nmin"), F.col("comp"))).alias("comp"),
            F.coalesce(F.col("nmin") < F.col("comp"), F.lit(False)).alias("__changed"),
        )

    done = 0
    changed = 1
    while done < max_iterations and changed:
        steps = min(check_every, max_iterations - done)
        cur = labels
        for _ in range(steps):
            cur = step(cur.select("node", "comp"))
        cur = cur.localCheckpoint()  # one materialization per check window
        # __changed reflects only the LAST lazy step: zero there means that
        # step was a fixpoint application — exact convergence, not a sample
        changed = cur.filter(F.col("__changed")).count()
        labels = cur.select("node", "comp")
        done += steps
    if changed:
        warnings.warn(
            f"connected_components: not converged after {max_iterations} rounds "
            "(a component's diameter exceeds the round budget); labels are partial",
            stacklevel=2,
        )
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

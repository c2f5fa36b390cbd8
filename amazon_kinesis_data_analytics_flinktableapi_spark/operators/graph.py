"""Graph primitives over edge lists (beyond components.py's CC): triangle
counting via the ordered-edge join.

Edges arrive id-ordered (``u < v``, one row per undirected edge) — the
invariant that makes each triangle enumerable exactly once as
(a<b<c): e1=(a,b), e2=(b,c), e3=(a,c).  At production scale the ordering
key becomes DEGREE rather than id (orient each edge from the lower-degree
endpoint), which bounds the join fanout by the graph's arboricity — the
standard trick for power-law graphs; the plan shape below is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triangle_participation(
    edges: DataFrame, src: str = "ua", dst: str = "ub", assume_normalized: bool = False
) -> DataFrame:
    """(user_id, degree, n_triangles) for every vertex of an undirected
    edge list.

    One three-way self-equi-join enumerates each triangle once; vertices
    then count their memberships.  Shuffles carry ids only.  Vertices with
    edges but no triangles report 0.

    The join algebra requires id-ordered unique edges (``src < dst`` per
    row, no duplicates, no self-loops) — a mirrored pair silently inflates
    both endpoints' degrees AND double-counts triangles, and a self-loop
    fabricates a phantom triangle per neighbor, all with plausible-looking
    integers.  Edges are therefore NORMALIZED here by default (orient by
    least/greatest, drop self-loops, dropDuplicates — one extra shuffle).
    Pass ``assume_normalized=True`` to skip that shuffle when the upstream
    generator already guarantees the invariant (e.g. a ``u < v``
    theta-join like queries/mining._interaction_edges).
    """
    e = edges.select(F.col(src).alias("ua"), F.col(dst).alias("ub"))
    if not assume_normalized:
        e = (
            e.filter(F.col("ua") != F.col("ub"))
            .select(
                F.least("ua", "ub").alias("ua"), F.greatest("ua", "ub").alias("ub")
            )
            .dropDuplicates(["ua", "ub"])
        )
    # cache: the normalized edge list is read four times (three triangle
    # join branches + the degree union) — uncached, the orient/dedup
    # shuffle re-runs per reference when exchange reuse doesn't kick in
    e = e.cache()
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.ua") == F.col("e1.ub"))
        .join(e3, (F.col("e3.ua") == F.col("e1.ua")) & (F.col("e3.ub") == F.col("e2.ub")))
        .select(F.col("e1.ua").alias("a"), F.col("e1.ub").alias("b"), F.col("e2.ub").alias("c"))
    )
    pertri = (
        tri.select(F.col("a").alias("user_id"))
        .unionAll(tri.select(F.col("b").alias("user_id")))
        .unionAll(tri.select(F.col("c").alias("user_id")))
    )
    tcnt = pertri.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_triangles"))
    deg = (
        e.select(F.col("ua").alias("user_id"))
        .unionAll(e.select(F.col("ub").alias("user_id")))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return deg.join(tcnt, "user_id", "left").select(
        "user_id", "degree", F.coalesce("n_triangles", F.lit(0)).alias("n_triangles")
    )

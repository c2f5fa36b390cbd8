"""Similarity search over embedding columns (driver extension surface).

- ``brute_topk``   — exact cosine top-k: broadcast the query set, scan the
                     corpus once, per-partition top-k via window rank.
                     The correctness baseline, and at 100 TB still the
                     right plan when |queries| is small (one corpus scan,
                     no index build).
- ``lsh_topk``     — random-hyperplane LSH: bucket corpus + queries by
                     sign-bit sketch, rank only within colliding buckets
                     (multi-probe over rotations).  The scale path when
                     |queries| × |corpus| is too big to brute force.

Dot products are built-in zip_with/aggregate expressions (functions.vector)
— JVM-side, no Python per row.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from amazon_kinesis_data_analytics_flinktableapi_spark.functions.vector import as_double, cosine


def brute_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 6,
) -> DataFrame:
    """Exact top-k neighbours per query: (q_id, c_id, cos_sim, rn).

    Scale: queries are broadcast (small side), so the corpus is scanned
    exactly once with no shuffle; the window rank shuffles only
    (q_id, c_id, sim) triples, never the vectors.
    """
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
    c = corpus.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        c.join(F.broadcast(q), F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id", cosine("q_vec", "c_vec").alias("__sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("__sim").desc(), F.col("c_id"))
    return (
        scored.select("q_id", "c_id", "__sim", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= k)
        .select("q_id", "c_id", F.round("__sim", scale).alias("cos_sim"), "rn")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 13) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).tolist()


def sketch_expr(vec_col: str, planes: list[list[float]]):
    """Sign-bit LSH sketch of a vector column as a long (one bit per plane)."""
    v = as_double(vec_col)
    bits = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        d = F.aggregate(F.zip_with(v, plane, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
        bits.append(F.when(d >= 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long")))
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 13,
    scale: int = 6,
) -> DataFrame:
    """Approximate top-k: rank only candidates whose sign-bit sketch
    collides with the query in ≥1 of ``n_tables`` independent tables.

    Scale: corpus is sketched once per table (scan-bound, codegen), the
    join is equi on (table, sketch) — shuffle ∝ corpus size × n_tables,
    candidate ranking ∝ bucket sizes, never |corpus|×|queries|.  Recall
    is tunable via n_planes (bucket width) and n_tables (probes); the
    recall test in tests/test_similarity.py pins it against brute_topk.
    """
    tables = [(_t, _hyperplanes(dim, n_planes, seed + 101 * _t)) for _t in range(n_tables)]

    def sketched(df: DataFrame, prefix: str) -> DataFrame:
        parts = [
            df.select(
                F.col(id_col).alias(f"{prefix}_id"),
                F.col(vec_col).alias(f"{prefix}_vec"),
                F.lit(t).alias("t"),
                sketch_expr(vec_col, planes).alias("sk"),
            )
            for t, planes in tables
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.union(p)
        return out

    cs = sketched(corpus, "c")
    qs = sketched(queries, "q")
    candidates = (
        cs.join(F.broadcast(qs), ["t", "sk"])
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id", "q_vec", "c_vec")
        .distinct()
    )
    scored = candidates.select("q_id", "c_id", cosine("q_vec", "c_vec").alias("__sim"))
    w = Window.partitionBy("q_id").orderBy(F.col("__sim").desc(), F.col("c_id"))
    return (
        scored.select("q_id", "c_id", "__sim", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= k)
        .select("q_id", "c_id", F.round("__sim", scale).alias("cos_sim"), "rn")
    )


def neardup_pairs(
    df: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos_sim ≥ t).

    Exact all-pairs — correct baseline for oracle checking; at corpus
    scale swap the self-join for the LSH-bucketed candidate generation
    above (same verification expression).
    """
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    sim = cosine("va", "vb")
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("__sim"))
        .filter(F.col("__sim") >= threshold)
        .select("id_a", "id_b", F.round("__sim", scale).alias("cos_sim"))
    )

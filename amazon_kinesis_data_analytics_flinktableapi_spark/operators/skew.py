"""Skew mitigation for heavy-hitter keys.

AQE's skew-join splitting (enabled in engine.build_spark) covers joins; for
*aggregations* over skewed keys — where one key owns a double-digit share of
100 TB and its partition straggles — the classic fix is salted two-phase
aggregation: shard each key across N salts, partially aggregate per
(key, salt), then merge the shards.  Correct for any algebraic aggregate
(sum/count/min/max; avg = sum+count merged at the end).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    merge_aggs: list[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) → groupBy(keys).

    ``partial_aggs`` run per (key, salt) shard; ``merge_aggs`` combine the
    shard results (referencing the partial alias names).  Example::

        salted_agg(
            events, ["event_type"],
            partial_aggs=[F.sum("value").alias("s"), F.count(F.lit(1)).alias("n")],
            merge_aggs=[F.sum("s").alias("total"), F.sum("n").alias("n_rows")],
        )

    Scale: phase 1 spreads a hot key over ``n_salts`` reducers, so the
    largest reducer shrinks ~n_salts×; phase 2 shuffles only
    |keys| × n_salts pre-aggregated rows.  The salt is a hash of a
    best-effort unique expression (monotonically_increasing_id), cheap and
    deterministic within a run.
    """
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)))
    phase1 = salted.groupBy(*keys, "__salt").agg(*partial_aggs)
    return phase1.groupBy(*keys).agg(*merge_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: salt the BIG side's key, replicate the SMALL
    side once per salt, join on (key, salt).

    The manual fallback when AQE's skew-join split can't apply (e.g. the
    skewed side feeds an aggregation in the same stage, or a deliberately
    non-AQE plan): a hot key's rows land on ``n_salts`` different reducers
    instead of one straggler.  Cost: the small side is duplicated
    ``n_salts``× — use only when |small| × n_salts ≪ |big|'s hot-key mass.
    Row multiplicity is exactly the plain join's (each big row joins its
    single replica of each matching small row).  ``how`` supports inner /
    left joins ONLY: a right/full outer would preserve every unmatched
    small-side replica — n_salts copies of each unmatched row — so those
    modes are rejected loudly rather than returning duplicated output.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left joins, got {how!r}: an outer-"
            "preserved small side would emit n_salts copies of every "
            "unmatched row (each replica survives the join independently)"
        )
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    replicated = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_big.join(replicated, [key, "__salt"], how).drop("__salt")

"""Ingest-time embedding validity bit (VERDICT r15 #3): the prepared
path (plain boolean column) and the lambda path (per-element
``finite_embedding``) must agree row-for-row through a real parquet
roundtrip — including on every hostile vector shape the swallow policy
covers — and the swallow helper must actually PREFER the column when
present (that's the whole perf point)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, LongType, StructField, StructType

from amazon_kinesis_data_analytics_flinktableapi_spark.functions.scalar import (
    EMB_FINITE_COL,
    finite_embedding,
    swallow_malformed_embeddings,
)
from amazon_kinesis_data_analytics_flinktableapi_spark.operators.embedding_prep import (
    with_embedding_validity,
    write_prepared_embeddings,
)
from amazon_kinesis_data_analytics_flinktableapi_spark.queries import REGISTRY
from tests.conftest import SF_SMOKE

_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(DoubleType(), containsNull=True)),
    ]
)

#: every shape the swallow contract covers → expected validity
HOSTILE = [
    (0, [1.0, 2.0], True),          # clean
    (1, None, True),                # NULL vector stays IN
    (2, [], True),                  # empty: forall over empty is TRUE
    (3, [float("nan"), 1.0], False),
    (4, [float("inf")], False),
    (5, [-float("inf"), 0.0], False),
    (6, [1.0, None], False),        # NULL element is malformed
    (7, [1.7976931348623157e308], True),   # DBL_MAX itself is finite
]


def _hostile_df(spark):
    return spark.createDataFrame([(i, v) for i, v, _ in HOSTILE], _SCHEMA)


def test_flag_matches_lambda_on_hostile_vectors_via_parquet(spark, tmp_path):
    dst = str(tmp_path / "emb")
    write_prepared_embeddings(_hostile_df(spark), dst)
    prep = spark.read.parquet(dst)
    got = {r["vec_id"]: r[EMB_FINITE_COL] for r in prep.collect()}
    assert got == {i: ok for i, _, ok in HOSTILE}
    # flag vs lambda recomputed on the roundtripped vectors: zero disagreement
    n_bad = prep.filter(
        ~F.col(EMB_FINITE_COL).eqNullSafe(finite_embedding("embedding"))
    ).count()
    assert n_bad == 0


def test_swallow_prefers_flag_column_and_drops_the_lambda(spark, tmp_path):
    dst = str(tmp_path / "emb")
    write_prepared_embeddings(_hostile_df(spark), dst)
    prep = spark.read.parquet(dst)
    out = swallow_malformed_embeddings(prep)
    # same rows survive as the lambda path
    assert sorted(r.vec_id for r in out.collect()) == sorted(
        i for i, _, ok in HOSTILE if ok
    )
    # and the prepared plan must NOT contain the interpreted array lambda
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "forall" not in plan and EMB_FINITE_COL in plan
    # fallback path (no flag column) still uses the lambda
    fb_plan = (
        swallow_malformed_embeddings(prep.drop(EMB_FINITE_COL))
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "forall" in fb_plan


def test_flag_filter_pushes_down_to_parquet_scan(spark, tmp_path):
    """The 100 TB point of the bit: a plain boolean column participates
    in parquet predicate pushdown (row-group skipping) — the interpreted
    lambda never can."""
    dst = str(tmp_path / "emb")
    write_prepared_embeddings(_hostile_df(spark), dst)
    plan = (
        swallow_malformed_embeddings(spark.read.parquet(dst))
        ._jdf.queryExecution().executedPlan().toString()
    )
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "EqualTo(emb_is_finite,true)" in pushed, pushed


def test_with_embedding_validity_refuses_existing_flag(spark):
    df = _hostile_df(spark).withColumn(EMB_FINITE_COL, F.lit(True))
    with pytest.raises(ValueError, match="already has"):
        with_embedding_validity(df)


def test_prepared_finite_query_attests_agreement(spark):
    rows = REGISTRY["embedding_prepared_finite"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_disagree == 0
    assert r.n_flag_finite == r.n_lambda_finite
    assert 0 < r.n_total and r.n_flag_finite <= r.n_total


def test_swallow_ignores_default_flag_for_other_vec_col(spark, tmp_path):
    """ADVICE r16: a bit written for 'embedding' must NOT be matched by a
    swallow over a different vector column — the flag name is derived
    from vec_col, so the non-default swallow falls back to the lambda on
    its OWN column."""
    dst = str(tmp_path / "emb")
    write_prepared_embeddings(_hostile_df(spark), dst)
    # add a second vector column whose values disagree with the bit:
    # vec_id 3 (NaN under 'embedding') gets a CLEAN second vector
    prep = spark.read.parquet(dst).withColumn(
        "embedding_q", F.when(F.col("vec_id") == 3, F.array(F.lit(9.0))).otherwise(F.col("embedding"))
    )
    out = swallow_malformed_embeddings(prep, vec_col="embedding_q")
    # row 3 survives (its embedding_q is clean) even though emb_is_finite
    # says FALSE — proof the stale default bit was not consulted
    assert 3 in {r.vec_id for r in out.collect()}
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "forall" in plan  # lambda fallback, not the mismatched bit


def test_swallow_raises_on_metadata_source_mismatch(spark, tmp_path):
    """The metadata stamp survives a parquet roundtrip and a bit renamed
    onto another column's flag name raises instead of filtering."""
    from amazon_kinesis_data_analytics_flinktableapi_spark.functions.scalar import (
        EMB_FINITE_SOURCE_KEY,
        finite_flag_col,
    )

    dst = str(tmp_path / "emb")
    # prepare a NON-default vector column; its flag gets the derived name
    df2 = _hostile_df(spark).withColumnRenamed("embedding", "embedding_q")
    prep = with_embedding_validity(df2, vec_col="embedding_q")
    prep.write.mode("overwrite").parquet(dst)
    back = spark.read.parquet(dst)
    flag = finite_flag_col("embedding_q")
    # stamp survived the roundtrip
    assert back.schema[flag].metadata.get(EMB_FINITE_SOURCE_KEY) == "embedding_q"
    # happy path: swallow over the column the bit was written for works
    n = swallow_malformed_embeddings(back, vec_col="embedding_q").count()
    assert n == sum(1 for _, _, ok in HOSTILE if ok)
    # hostile path: rename the flag onto the DEFAULT column's flag name
    # with a default-named vector column present — name matches, stamp
    # does not → raise, never filter on the mismatched bit
    forged = back.withColumnRenamed(flag, finite_flag_col("embedding")).withColumn(
        "embedding", F.col("embedding_q")
    )
    with pytest.raises(ValueError, match="was written for column"):
        swallow_malformed_embeddings(forged, vec_col="embedding")


def test_nan_literal_roundtrip_assumption():
    # pin the fixture's own sanity: NaN really is NaN after the tuple trip
    assert math.isnan(HOSTILE[3][1][0])

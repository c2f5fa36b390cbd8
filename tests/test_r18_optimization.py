"""Focused tests for the r18 optimization-round internal changes.

Same contract as test_r17_optimization: every change that touches an
operator's internals pins value-parity with the form it replaced (or the
plan shape the change exists to guarantee); OPTIMIZATION_r18.md carries
the timings."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_grouped_kth_select_multi_materialize_parity(spark):
    """The r18 ``materialize`` knob on the selection operator must be
    value-identical in both positions (the A/B instrument the round's
    measurements used; default False is the measured winner — the pinned
    arm exists for expensive-input callers at real scale)."""
    from amazon_kinesis_data_analytics_flinktableapi_spark.operators.ranking import (
        grouped_kth_select_multi,
    )

    rows = [(g, i, float((i * 37 + g * 11) % 100)) for g in range(3) for i in range(200)]
    rows += [(9, 0, float("nan")), (9, 1, float("inf")), (9, 2, 5.0)]
    df = spark.createDataFrame(rows, "g int, event_id int, value double")
    out = {}
    for mat in (False, True):
        out[mat] = sorted(
            tuple(r)
            for r in grouped_kth_select_multi(
                df, ["g"], ps=[0.25, 0.5, 0.75], materialize=mat
            ).collect()
        )
    assert out[False] == out[True]
    assert len(out[True]) == 4 * 3  # 4 groups x 3 percentiles


def test_robust_mad_select_final_join_is_broadcast(spark):
    """The r18 SMJ removal: robust_mad_select's final med ⋈ mad ⋈ n join
    chain is broadcast-hinted (all sides are one-row-per-group frames;
    the checkpointed med side's LogicalRDD has no size estimate, so the
    unhinted planner kept that join a SortMergeJoin even in the AQE-final
    plan — the r17 after-dump's only Final-Plan SMJ).  Pin: the output
    joins — the first two join nodes of the static physical plan, which
    the hint controls directly (AQE conversion of the operator-internal
    estimate-based SMJs is runtime- and size-dependent, so the executed
    sf0.1 dump in plans/r18/ carries that half of the evidence) — are
    BroadcastHashJoin."""
    from amazon_kinesis_data_analytics_flinktableapi_spark.queries import REGISTRY

    df = REGISTRY["robust_mad_select"].fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().sparkPlan().toString()
    joins = [l for l in plan.splitlines() if "Join" in l]
    assert len(joins) >= 2
    assert all("BroadcastHashJoin" in l for l in joins[:2]), joins[:2]


def test_pin_reliable_checkpoint_roundtrip(spark, tmp_path, monkeypatch):
    """The r18 shared ``pin`` helper (VERDICT r17 item 3): default is the
    pre-knob localCheckpoint; ``reliable=True`` routes to replicated
    ``checkpoint()`` (checkpoint dir required); the env switch flips the
    registered-query default.  Both forms are value-identical."""
    from amazon_kinesis_data_analytics_flinktableapi_spark.operators.materialize import (
        pin,
        reliable_default,
    )

    monkeypatch.delenv("SPARK_GRAFT_RELIABLE_CHECKPOINT", raising=False)
    assert reliable_default() is False
    local = pin(spark.range(10))
    assert sorted(r.id for r in local.collect()) == list(range(10))
    assert "LogicalRDD" in local._jdf.queryExecution().optimizedPlan().toString()

    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    rel = pin(spark.range(10), reliable=True)
    assert sorted(r.id for r in rel.collect()) == list(range(10))
    assert "LogicalRDD" in rel._jdf.queryExecution().optimizedPlan().toString()

    monkeypatch.setenv("SPARK_GRAFT_RELIABLE_CHECKPOINT", "1")
    assert reliable_default() is True


def _hostile_embeddings(spark):
    """Corpus whose HEAD (lowest ids — the codebook source) is clean but
    whose tail carries every edge the expression forms define semantics
    for: a ragged (short) vector, a NULL-element vector, an empty
    vector, and a NULL vector."""
    rows = [
        (i, [((i * 13 + j * 7) % 19 - 9) / 3.0 for j in range(8)]) for i in range(30)
    ]
    rows += [
        (90, [1.0, 2.0, 3.0]),          # ragged: zip_with pads → dist/dot 0
        (91, [0.5, None, 1.5, 2.0, -1.0, 0.25, 3.0, -2.0]),  # NULL element
        (92, []),                        # empty
        (93, None),                      # NULL vector (dropped by _quantized_base)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_clustering_kernels_match_expression_paths(spark, monkeypatch):
    """The r18 Arrow argmin/top-n/PQ kernels must be row-identical to the
    expression forms they replace — including the ragged/NULL-element/
    empty/NULL edge rows, whose behavior the expression path defines via
    zip_with+aggregate+coalesce (mismatch or NULL element ⇒ distance and
    dot 0 ⇒ ties to the smallest code id).  The expression arm is forced
    by making the codebook look non-rectangular to the dispatcher."""
    import amazon_kinesis_data_analytics_flinktableapi_spark.operators.clustering as C

    df = _hostile_embeddings(spark)
    ops = {
        "kmeans": lambda: C.kmeans_lloyd(df, k=4, n_iters=2),
        "pq_encode": lambda: C.pq_encode(df, n_subspaces=4, n_codes=4),
        "pq_adc": lambda: C.pq_adc_topk(
            df, df.filter(F.col("vec_id") < 3), k=5, n_subspaces=4, n_codes=4
        ),
        "ivfpq": lambda: C.ivfpq_topk(
            df, df.filter(F.col("vec_id") < 3),
            k=5, n_centroids=6, nprobe=2, n_subspaces=4, n_codes=4,
        ),
        "rq": lambda: C.rq_encode(df, n_codes1=4, n_codes2=4),
    }
    kernel = {name: sorted(tuple(r) for r in fn().collect()) for name, fn in ops.items()}
    monkeypatch.setattr(C, "_codebook_matrix", lambda rows: None)
    expr = {name: sorted(tuple(r) for r in fn().collect()) for name, fn in ops.items()}
    for name in ops:
        assert kernel[name] == expr[name], f"{name}: kernel/expression divergence"
        assert kernel[name], f"{name}: empty result"

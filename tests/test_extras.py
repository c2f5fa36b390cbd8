"""Extras operators: as-of join semantics + sketch accuracy bounds."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from amazon_kinesis_data_analytics_flinktableapi_spark.operators.asof_join import as_of_join
from amazon_kinesis_data_analytics_flinktableapi_spark.queries import REGISTRY
from amazon_kinesis_data_analytics_flinktableapi_spark.sources.batch import read_table
from tests.conftest import SF_SMOKE

T0 = datetime(2024, 1, 1, 12, 0, 0)


def test_asof_picks_latest_not_all(spark):
    orders = spark.createDataFrame(
        [(1, T0, "EUR"), (2, T0 + timedelta(seconds=30), "EUR"), (3, T0, "GBP")],
        "id int, t timestamp, ccy string",
    )
    rates = spark.createDataFrame(
        [
            (T0 - timedelta(seconds=10), "EUR", 10),  # older
            (T0 - timedelta(seconds=1), "EUR", 20),   # latest before order 1
            (T0 + timedelta(seconds=5), "EUR", 30),   # latest before order 2
        ],
        "rt timestamp, ccy string, rate int",
    )
    out = as_of_join(orders, rates, on="ccy", left_id="id", left_time="t",
                     right_time="rt", horizon="1 minute")
    got = {r.id: r.r_rate for r in out.collect()}
    assert got == {1: 20, 2: 30, 3: None}
    assert out.count() == 3  # exactly one row per left row — no fan-out


def test_approx_sketches_accuracy(spark):
    out = {r.event_type: r for r in REGISTRY["approx_sketches"].fn(spark, SF_SMOKE).collect()}
    ev = read_table(spark, SF_SMOKE, "events")
    exact = {
        r.event_type: r
        for r in ev.groupBy("event_type").agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("p50"),
        ).collect()
    }
    for et, e in exact.items():
        a = out[et]
        assert abs(a.approx_users - e.users) / e.users <= 0.05, (et, a.approx_users, e.users)
        assert abs(a.q50 - e.p50) / max(abs(e.p50), 1e-9) <= 0.05


def test_global_running_sum_partition_invariant(spark):
    """The running sum must be bit-identical for ANY partition count —
    offsets + local prefix sums compose to the same totals regardless of
    where the sampled range boundaries land."""
    from amazon_kinesis_data_analytics_flinktableapi_spark.operators.ranking import global_running_sum

    rows = [(i, (i * 37) % 11 + 1) for i in range(257)]
    df = spark.createDataFrame(rows, "id long, v long")
    expect = {}
    acc = 0
    for i, v in rows:  # ids are already in order
        acc += v
        expect[i] = acc
    for n in (1, 3, 8):
        got = {
            r["id"]: r["rs"]
            for r in global_running_sum(df, [F.col("id")], "v", sum_name="rs", num_partitions=n).collect()
        }
        assert got == expect, f"num_partitions={n} diverged"


def test_kmv_estimator_accuracy(spark):
    """The KMV estimator path (group cardinality > k): relative error stays
    within ~4/sqrt(k) of the exact distinct count on synthetic groups."""
    from amazon_kinesis_data_analytics_flinktableapi_spark.queries.extras import kmv_distinct

    df = spark.range(40_000).select(
        (F.col("id") % 2).cast("string").alias("g"),
        # group 0: 20k candidate values with collisions -> ~9.9k distinct
        # group 1: distinct-per-row ids
        F.when(F.col("id") % 2 == 0, F.pmod(F.xxhash64("id"), 10_000)).otherwise(
            F.col("id") + 1_000_000
        ).alias("v"),
    )
    exact = {r["g"]: r["n"] for r in df.groupBy("g").agg(F.countDistinct("v").alias("n")).collect()}
    got = {r["g"]: r["kmv_distinct"] for r in kmv_distinct(df, "g", "v", k=256).collect()}
    assert set(got) == set(exact)
    for g, n in exact.items():
        assert n > 256, "test must exercise the estimator path"
        rel = abs(got[g] - n) / n
        assert rel < 0.25, f"group {g}: est {got[g]} vs exact {n} (rel {rel:.3f})"


def test_cms_never_undercounts_and_is_tight_on_heavy_hitters(spark, tmp_path):
    # CMS property: estimate >= exact always; with 1024 cells over a small
    # vocab the top tokens should estimate exactly or nearly so
    import shutil

    from amazon_kinesis_data_analytics_flinktableapi_spark.queries.extras import (
        q_cms_frequency_sketch,
    )

    src = "/root/testdata/sf0.001"
    rows = q_cms_frequency_sketch(spark, src).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.cms_estimate >= r.exact_n, f"CMS undercounted {r.tok}"
        assert r.cms_estimate <= r.exact_n * 2, f"CMS wildly loose on heavy hitter {r.tok}"

"""Property-based check of the interval-join operators: on arbitrary
generated inputs, both the declarative and the bucketed plans must agree
with a brute-force Python evaluation of the reference predicate
(StreamingJob.java:98-100) — half-open window, multi-match fan-out,
left-outer NULLs."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import given, settings
from hypothesis import strategies as st

from amazon_kinesis_data_analytics_flinktableapi_spark.operators.interval_join import (
    interval_join,
    interval_join_bucketed,
)
from amazon_kinesis_data_analytics_flinktableapi_spark.schemas import (
    EXCHANGE_RATE_SCHEMA,
    ORDER_SCHEMA,
)

T0 = datetime(2024, 1, 1, 12, 0, 0)
CCYS = ["EUR", "USD", "GBP"]
WINDOW_S = 5

_spark = None


def get_spark():
    global _spark
    if _spark is None:
        from amazon_kinesis_data_analytics_flinktableapi_spark.engine import build_spark

        _spark = build_spark(app_name="prop-tests", master="local[4]", shuffle_partitions=4)
        _spark.sparkContext.setLogLevel("ERROR")
    return _spark


orders_st = st.lists(
    st.tuples(st.integers(0, 10**6), st.integers(-15000, 15000), st.integers(100, 1000),
              st.sampled_from(CCYS)),
    min_size=0, max_size=12, unique_by=lambda t: t[0],
)
rates_st = st.lists(
    st.tuples(st.integers(-15000, 15000), st.sampled_from(CCYS), st.integers(2, 100)),
    min_size=0, max_size=12,
)


def brute_force(orders, rates, window_s=WINDOW_S):
    out = set()
    for oid, oms, amount, ccy in orders:
        matches = [
            rate
            for rms, rccy, rate in rates
            if rccy == ccy and oms >= rms and rms > oms - window_s * 1000
        ]
        if matches:
            for rate in matches:
                out.add((oid, rate))
        else:
            out.add((oid, None))
    return out


@settings(max_examples=25, deadline=None)
# window width swept too: the bucketed plan's algebra (bucket = interval
# width, right side exploded into 2 adjacent buckets) must hold for ANY
# width, not just the reference's 5 s — 1 s makes nearly every row its own
# bucket, 30 s collapses the fixture into one or two buckets per key
@given(orders=orders_st, rates=rates_st, window_s=st.sampled_from([1, 5, 30]))
def test_both_plans_match_brute_force(orders, rates, window_s):
    spark = get_spark()
    odf = spark.createDataFrame(
        [(oid, T0 + timedelta(milliseconds=ms), amt, c) for oid, ms, amt, c in orders],
        ORDER_SCHEMA,
    )
    rdf = spark.createDataFrame(
        [(T0 + timedelta(milliseconds=ms), c, r) for ms, c, r in rates],
        EXCHANGE_RATE_SCHEMA,
    )
    expected = brute_force(orders, rates, window_s)
    for impl in (interval_join, interval_join_bucketed):
        j = impl(odf, rdf, on="currency", left_time="orderTime",
                 right_time="exchangeRateTime", interval=f"{window_s} seconds")
        got = {(r["id"], r["rate"]) for r in j.select("l.id", "r.rate").collect()}
        assert got == expected, f"{impl.__name__}: {got ^ expected}"


def brute_force_forward(orders, rates, window_s=WINDOW_S):
    out = set()
    for oid, oms, amount, ccy in orders:
        matches = [
            rate
            for rms, rccy, rate in rates
            if rccy == ccy and rms >= oms and rms < oms + window_s * 1000
        ]
        if matches:
            for rate in matches:
                out.add((oid, rate))
        else:
            out.add((oid, None))
    return out


@settings(max_examples=25, deadline=None)
@given(orders=orders_st, rates=rates_st, window_s=st.sampled_from([1, 5, 30]))
def test_forward_direction_both_plans_match_brute_force(orders, rates, window_s):
    spark = get_spark()
    odf = spark.createDataFrame(
        [(oid, T0 + timedelta(milliseconds=ms), amt, c) for oid, ms, amt, c in orders],
        ORDER_SCHEMA,
    )
    rdf = spark.createDataFrame(
        [(T0 + timedelta(milliseconds=ms), c, r) for ms, c, r in rates],
        EXCHANGE_RATE_SCHEMA,
    )
    expected = brute_force_forward(orders, rates, window_s)
    for impl in (interval_join, interval_join_bucketed):
        j = impl(odf, rdf, on="currency", left_time="orderTime",
                 right_time="exchangeRateTime", interval=f"{window_s} seconds",
                 direction="forward")
        got = {(r["id"], r["rate"]) for r in j.select("l.id", "r.rate").collect()}
        assert got == expected, f"{impl.__name__}: {got ^ expected}"

"""FIXTURES.md §4 boundary fixtures for the interval join (Q4): half-open
window (o.t − 5 s, o.t], multi-match fan-out, left-outer NULLs."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from amazon_kinesis_data_analytics_flinktableapi_spark.operators.interval_join import interval_join
from amazon_kinesis_data_analytics_flinktableapi_spark.schemas import EXCHANGE_RATE_SCHEMA, ORDER_SCHEMA

T0 = datetime(2024, 1, 1, 12, 0, 0)


def ms(offset_ms: int) -> datetime:
    return T0 + timedelta(milliseconds=offset_ms)


@pytest.fixture(scope="module")
def joined(spark):
    orders = spark.createDataFrame(
        [
            (1, ms(0), 100, "EUR"),   # boundary probes target this order
            (2, ms(0), 200, "GBP"),   # multi-match fan-out
            (3, ms(0), 300, "AUD"),   # no rate at all -> NULL
            (4, ms(0), 400, "CAD"),   # rate exists but out of window -> NULL
        ],
        ORDER_SCHEMA,
    )
    rates = spark.createDataFrame(
        [
            (ms(-5000), "EUR", 11),   # exactly t-5s: strict bound -> NO match
            (ms(-4999), "EUR", 12),   # just inside -> match
            (ms(0), "EUR", 13),       # exactly t: inclusive -> match
            (ms(1), "EUR", 14),       # just after -> NO match
            (ms(-3000), "GBP", 21),   # both in window -> 2 rows for order 2
            (ms(-1000), "GBP", 22),
            (ms(-1000), "USD", 31),   # in window, wrong currency -> no match
            (ms(-6000), "CAD", 41),   # out the bottom -> order 4 NULL
        ],
        EXCHANGE_RATE_SCHEMA,
    )
    df = interval_join(
        orders, rates, on="currency", left_time="orderTime", right_time="exchangeRateTime",
        interval="5 seconds",
    ).select(
        F.col("l.id").alias("id"), F.col("r.rate").alias("rate")
    )
    return {(r.id, r.rate) for r in df.collect()}


def test_half_open_window_bounds(joined):
    eur = {r for i, r in joined if i == 1}
    assert eur == {12, 13}, f"expected strict lower / inclusive upper, got rates {eur}"


def test_multi_match_fanout(joined):
    assert {r for i, r in joined if i == 2} == {21, 22}


def test_left_outer_null_when_no_rate(joined):
    assert {r for i, r in joined if i == 3} == {None}


def test_left_outer_null_when_rate_out_of_window(joined):
    assert {r for i, r in joined if i == 4} == {None}


def test_bucketed_rejects_right_preserving_joins(spark):
    import pytest as _pytest
    from amazon_kinesis_data_analytics_flinktableapi_spark.operators.interval_join import (
        interval_join_bucketed,
    )

    df = spark.createDataFrame([(1, "EUR")], "id long, currency string").withColumn(
        "t", F.current_timestamp()
    )
    for how in ("right_outer", "full_outer", "full", "outer"):
        with _pytest.raises(ValueError, match="right-preserving"):
            interval_join_bucketed(df, df, on="currency", left_time="t", right_time="t", how=how)


def test_non_positive_interval_rejected(spark):
    """r8 guard sweep: a zero/negative interval makes the window predicate
    unsatisfiable — a left-outer join would silently emit every left row
    with NULLs.  Both plan forms must refuse at build time, including
    calendar intervals on the naive path."""
    import pytest

    from amazon_kinesis_data_analytics_flinktableapi_spark.operators.interval_join import (
        interval_join,
        interval_join_bucketed,
    )

    df = spark.createDataFrame(
        [(1, "EUR")], "id int, currency string"
    ).withColumn("t", F.lit("2024-01-01 00:00:00").cast("timestamp"))
    for bad in ("0 seconds", "-5 seconds", "0 months"):
        with pytest.raises(ValueError, match="strictly positive"):
            interval_join(df, df, on="currency", left_time="t", right_time="t", interval=bad)
    for bad in ("0 seconds", "-5 seconds"):
        with pytest.raises(ValueError, match="strictly positive"):
            interval_join_bucketed(
                df, df, on="currency", left_time="t", right_time="t", interval=bad
            )


def test_interval_validation_is_local_for_fixed_width_forms():
    """ADVICE r8: _require_positive_interval launched a driver-side Spark
    job per plan build.  Fixed-width forms must now validate with NO live
    session at all (spark=None proves no job can run); only calendar
    forms fall back to the Catalyst probe."""
    import pytest

    from amazon_kinesis_data_analytics_flinktableapi_spark.operators.interval_join import (
        _require_positive_interval,
        _try_parse_time_interval_us,
    )

    # local parser: the unambiguous integer time-unit subset
    assert _try_parse_time_interval_us("5 seconds") == 5_000_000
    assert _try_parse_time_interval_us("1 hour 30 minutes") == 5_400 * 10**6
    assert _try_parse_time_interval_us("2 WEEKS") == 2 * 7 * 86_400 * 10**6
    assert _try_parse_time_interval_us("250 milliseconds") == 250_000
    assert _try_parse_time_interval_us("-5 seconds") == -5_000_000
    # not locally parseable -> None (Catalyst remains the authority)
    for exotic in ("1 month", "0 months", "'5' second", "0.5 seconds", "5 parsecs"):
        assert _try_parse_time_interval_us(exotic) is None
    # validation of fixed-width forms needs no session ...
    _require_positive_interval(None, "45 seconds")
    with pytest.raises(ValueError, match="strictly positive"):
        _require_positive_interval(None, "0 seconds")
    # ... and the positive-cache makes repeat validations free even for
    # forms that would otherwise probe (seeded by the first call)
    _require_positive_interval(None, "45 seconds")


def test_bucketed_rejects_reserved_internal_columns(spark):
    """Review fix: an input already carrying __bucket/__b0 would be
    silently clobbered and dropped — rejected loudly instead."""
    import pytest

    from amazon_kinesis_data_analytics_flinktableapi_spark.operators.interval_join import (
        interval_join_bucketed,
    )

    o = spark.sql("SELECT 1 AS k, timestamp'2024-01-01' AS lt, 0 AS __bucket")
    r = spark.sql("SELECT 1 AS k, timestamp'2024-01-01' AS rt")
    with pytest.raises(ValueError, match="__bucket"):
        interval_join_bucketed(o, r, on="k", left_time="lt", right_time="rt")
    o2 = spark.sql("SELECT 1 AS k, timestamp'2024-01-01' AS lt")
    r2 = spark.sql("SELECT 1 AS k, timestamp'2024-01-01' AS rt, 0 AS __b0")
    with pytest.raises(ValueError, match="__b0"):
        interval_join_bucketed(o2, r2, on="k", left_time="lt", right_time="rt")

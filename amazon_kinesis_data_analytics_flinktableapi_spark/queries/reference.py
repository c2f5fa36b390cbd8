"""Reference-surface queries (SURVEY.md §2 S1-K3) on driver TESTDATA.

The reference's single query (StreamingJob.java:91-101) is a stream-stream
LEFT OUTER interval join of high-rate Orders to low-rate ExchangeRates on
currency within ``(o.t - 5s, o.t]``, projected through a scalar UDF and int
arithmetic.  Per FIXTURES.md §5 the roles map onto TESTDATA ``events``:

- orders role  ← all events (id, order_time, amount, currency := event_type)
- rates role   ← the low-rate slice ``event_id % 17 = 0`` (~6%)
- join window  ← 1 hour (events average one per ~4.3 min per type at
  sf0.01, so a 1 h window exercises match, multi-match fan-out, AND
  no-match NULL rows — all three Q4 semantics).

Casts use FLOOR before int conversion: Spark CAST(double AS INT) truncates
while DuckDB rounds, so FLOOR is the only portable int-ization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amazon_kinesis_data_analytics_flinktableapi_spark.functions.scalar import register_timestamp_to_string
from amazon_kinesis_data_analytics_flinktableapi_spark.operators.interval_join import (
    interval_join,
    interval_join_bucketed,
)
from amazon_kinesis_data_analytics_flinktableapi_spark.queries import load, query

_ORDERS_ROLE = """
    SELECT event_id AS id,
           ts AS order_time,
           CAST(FLOOR(value * 100) AS INTEGER) AS amount,
           event_type AS currency
    FROM events
"""
_RATES_ROLE = """
    SELECT ts AS rate_time,
           event_type AS currency,
           CAST(FLOOR(value) AS INTEGER) % 97 + 2 AS rate
    FROM events
    WHERE event_id % 17 = 0
"""


def _orders_role(spark: SparkSession, sf_dir: str) -> DataFrame:
    (ev,) = load(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id").alias("id"),
        F.col("ts").alias("order_time"),
        F.floor(F.col("value") * 100).cast("int").alias("amount"),
        F.col("event_type").alias("currency"),
    )


def _rates_role(spark: SparkSession, sf_dir: str) -> DataFrame:
    (ev,) = load(spark, sf_dir, "events")
    return ev.filter(F.col("event_id") % 17 == 0).select(
        F.col("ts").alias("rate_time"),
        F.col("event_type").alias("currency"),
        (F.floor(F.col("value")).cast("int") % 97 + 2).alias("rate"),
    )


@query(
    "interval_join",
    oracle=f"""
    WITH o AS ({_ORDERS_ROLE}), r AS ({_RATES_ROLE})
    SELECT o.id, o.order_time, o.amount, o.currency, r.rate,
           o.amount * r.rate AS converted_amount
    FROM o LEFT JOIN r
      ON o.currency = r.currency
     AND o.order_time >= r.rate_time
     AND r.rate_time > o.order_time - INTERVAL 1 HOUR
    """,
    headline=True,
    doc="Q4: left-outer interval join, half-open (t-1h, t], multi-match fan-out",
)
def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # bucketed plan: equi-join on (currency, hour-bucket) — the
    # low-cardinality currency key alone would serialize the probe
    o = _orders_role(spark, sf_dir)
    r = _rates_role(spark, sf_dir)
    j = interval_join_bucketed(o, r, on="currency", left_time="order_time", right_time="rate_time", interval="1 hour")
    return j.select(
        F.col("l.id").alias("id"),
        F.col("l.order_time").alias("order_time"),
        F.col("l.amount").alias("amount"),
        F.col("l.currency").alias("currency"),
        F.col("r.rate").alias("rate"),
        (F.col("l.amount") * F.col("r.rate")).alias("converted_amount"),
    )


#: DuckDB replica of java.sql.Timestamp.toString() (see functions.scalar):
#: seconds part, then fraction with trailing zeros stripped, min 1 digit.
_DUCK_TS_TO_STRING = (
    "strftime({c}, '%Y-%m-%d %H:%M:%S') || '.' || "
    "CASE WHEN regexp_replace(strftime({c}, '%f'), '0+$', '') = '' THEN '0' "
    "ELSE regexp_replace(strftime({c}, '%f'), '0+$', '') END"
)


@query(
    "currency_conversion",
    oracle=f"""
    WITH o AS ({_ORDERS_ROLE}), r AS ({_RATES_ROLE})
    SELECT o.id,
           {_DUCK_TS_TO_STRING.format(c="o.order_time")} AS order_time,
           o.amount AS original_amount,
           o.amount * r.rate AS converted_amount
    FROM o LEFT JOIN r
      ON o.currency = r.currency
     AND o.order_time >= r.rate_time
     AND r.rate_time > o.order_time - INTERVAL 1 HOUR
    """,
    headline=True,
    doc="the reference's full SELECT (StreamingJob.java:92-100): UDF + int arithmetic + aliases",
)
def q_currency_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact shape of the reference result (Result.java:3-8), via engine SQL
    with the registered ``TimestampToString`` function — exercises the SQL
    entry point + catalog + UDF registration path end-to-end (the join
    itself runs through the bucketed operator plan)."""
    register_timestamp_to_string(spark)
    j = interval_join_bucketed(
        _orders_role(spark, sf_dir),
        _rates_role(spark, sf_dir),
        on="currency",
        left_time="order_time",
        right_time="rate_time",
        interval="1 hour",
    )
    j.createOrReplaceTempView("JoinedOrders")
    return spark.sql(
        """
        SELECT id,
               TimestampToString(order_time) AS order_time,
               amount AS original_amount,
               amount * rate AS converted_amount
        FROM JoinedOrders
        """
    )


@query(
    "projection_filter",
    oracle="""
    SELECT l_orderkey,
           l_extendedprice * (1 - l_discount) AS disc_price,
           l_shipdate
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-06-01' AND l_discount > 0.05
    """,
    doc="S3/Q1: projection with expression arithmetic + pushed-down filter",
)
def q_projection_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = load(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_shipdate") >= F.lit("1995-06-01").cast("timestamp")) & (F.col("l_discount") > 0.05))
        .select(
            "l_orderkey",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("disc_price"),
            "l_shipdate",
        )
    )

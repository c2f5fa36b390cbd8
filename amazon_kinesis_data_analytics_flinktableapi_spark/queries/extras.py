"""Completion extras: as-of join, lag/lead analytics, UDTF-style explode,
session gaps-and-islands, cascaded multi-resolution rollup, approximate
sketches — rounding out the Table-API-style surface plus the
training-pipeline toolkit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from amazon_kinesis_data_analytics_flinktableapi_spark.functions.text import half_up_round
from amazon_kinesis_data_analytics_flinktableapi_spark.operators.asof_join import as_of_join
from amazon_kinesis_data_analytics_flinktableapi_spark.queries import load, query


def _asof_orders_rates(ev):
    """The shared orders/rates role projection of the events table used by
    all three as-of surfaces (backward, forward, cogroup-pandas) — ONE
    definition, so a change to the rate derivation (e.g. the % 97
    modulus) cannot silently attest different datasets per query; each
    oracle CTE mirrors this projection.  Non-finite value rows are
    swallowed (functions.scalar.finite_or_null — r14 audit: the inf→int
    binding aborts the job on both engines; the reference's policy
    degrades instead) — each oracle CTE carries the matching
    ``isfinite`` predicate."""
    from amazon_kinesis_data_analytics_flinktableapi_spark.functions.scalar import finite_or_null

    ev = ev.filter(finite_or_null("value"))
    orders = ev.select(
        F.col("event_id").alias("id"),
        F.col("ts").alias("order_time"),
        F.floor(F.col("value") * 100).cast("int").alias("amount"),
        F.col("event_type").alias("currency"),
    )
    rates = ev.filter(F.col("event_id") % 17 == 0).select(
        F.col("ts").alias("rate_time"),
        F.col("event_type").alias("currency"),
        (F.floor(F.col("value")).cast("int") % 97 + 2).alias("rate"),
    )
    return orders, rates


@query(
    "asof_join_latest_rate",
    oracle="""
    WITH o AS (
      SELECT event_id AS id, ts AS order_time,
             CAST(FLOOR(value * 100) AS INTEGER) AS amount,
             event_type AS currency
      FROM events
      WHERE (value IS NULL OR isfinite(value))
    ), r AS (
      SELECT ts AS rate_time, event_type AS currency,
             CAST(FLOOR(value) AS INTEGER) % 97 + 2 AS rate
      FROM events
      WHERE event_id % 17 = 0 AND (value IS NULL OR isfinite(value))
    ), ranked AS (
      SELECT o.id, o.amount, o.currency, r.rate,
             row_number() OVER (PARTITION BY o.id
                                ORDER BY r.rate_time DESC NULLS LAST,
                                         r.rate DESC NULLS LAST) AS rn
      FROM o LEFT JOIN r
        ON o.currency = r.currency
       AND o.order_time >= r.rate_time
       AND r.rate_time > o.order_time - INTERVAL 1 HOUR
    )
    SELECT id, amount, currency, rate,
           amount * rate AS converted_amount
    FROM ranked WHERE rn = 1
    """,
    doc="as-of join: the single LATEST rate at or before each order (vs Q4's fan-out)",
)
def q_asof_join_latest_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    (ev,) = load(spark, sf_dir, "events")
    orders, rates = _asof_orders_rates(ev)
    j = as_of_join(orders, rates, on="currency", left_id="id",
                   left_time="order_time", right_time="rate_time",
                   horizon="1 hour", tie_breakers=["rate"])
    return j.select(
        "id", "amount", "currency",
        F.col("r_rate").alias("rate"),
        (F.col("amount") * F.col("r_rate")).alias("converted_amount"),
    )


@query(
    "asof_forward_join",
    oracle="""
    WITH o AS (
      SELECT event_id AS id, ts AS order_time,
             CAST(FLOOR(value * 100) AS INTEGER) AS amount,
             event_type AS currency
      FROM events
      WHERE (value IS NULL OR isfinite(value))
    ), r AS (
      SELECT ts AS rate_time, event_type AS currency,
             CAST(FLOOR(value) AS INTEGER) % 97 + 2 AS rate
      FROM events
      WHERE event_id % 17 = 0 AND (value IS NULL OR isfinite(value))
    ), ranked AS (
      SELECT o.id, o.amount, o.currency, r.rate,
             row_number() OVER (PARTITION BY o.id
                                ORDER BY r.rate_time ASC NULLS LAST,
                                         r.rate DESC NULLS LAST) AS rn
      FROM o LEFT JOIN r
        ON o.currency = r.currency
       AND r.rate_time >= o.order_time
       AND r.rate_time < o.order_time + INTERVAL 1 HOUR
    )
    SELECT id, amount, currency, rate,
           amount * rate AS converted_amount
    FROM ranked WHERE rn = 1
    """,
    doc="forward as-of join: the single EARLIEST rate at or after each order "
    "(look-ahead enrichment — the mirror of asof_join_latest_rate)",
)
def q_asof_forward_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    (ev,) = load(spark, sf_dir, "events")
    orders, rates = _asof_orders_rates(ev)
    j = as_of_join(orders, rates, on="currency", left_id="id",
                   left_time="order_time", right_time="rate_time",
                   horizon="1 hour", tie_breakers=["rate"], direction="forward")
    return j.select(
        "id", "amount", "currency",
        F.col("r_rate").alias("rate"),
        (F.col("amount") * F.col("r_rate")).alias("converted_amount"),
    )


@query(
    "asof_join_nearest",
    oracle="""
    WITH o AS (
      SELECT event_id AS id, ts AS order_time,
             CAST(FLOOR(value * 100) AS INTEGER) AS amount,
             event_type AS currency
      FROM events
      WHERE (value IS NULL OR isfinite(value))
    ), r AS (
      SELECT ts AS rate_time, event_type AS currency,
             CAST(FLOOR(value) AS INTEGER) % 97 + 2 AS rate
      FROM events
      WHERE event_id % 17 = 0 AND (value IS NULL OR isfinite(value))
    ), ranked AS (
      SELECT o.id, o.amount, o.currency, r.rate,
             row_number() OVER (
               PARTITION BY o.id
               ORDER BY abs(epoch_us(r.rate_time) - epoch_us(o.order_time))
                          ASC NULLS LAST,
                        r.rate_time ASC NULLS LAST,
                        r.rate DESC NULLS LAST) AS rn
      FROM o LEFT JOIN r
        ON o.currency = r.currency
       AND r.rate_time > o.order_time - INTERVAL 1 HOUR
       AND r.rate_time < o.order_time + INTERVAL 1 HOUR
    )
    SELECT id, amount, currency, rate,
           amount * rate AS converted_amount
    FROM ranked WHERE rn = 1
    """,
    doc="nearest as-of join: the single rate CLOSEST in time to each order "
    "on either side within ±1 h (min |Δt|, ties toward the earlier/"
    "backward row — pandas merge_asof(direction='nearest') semantics), "
    "completing the backward/forward family.  Candidate window is the "
    "union of the two half-open one-sided windows; ordering is exact "
    "integer micros, never a float time compare",
)
def q_asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    (ev,) = load(spark, sf_dir, "events")
    orders, rates = _asof_orders_rates(ev)
    j = as_of_join(orders, rates, on="currency", left_id="id",
                   left_time="order_time", right_time="rate_time",
                   horizon="1 hour", tie_breakers=["rate"], direction="nearest")
    return j.select(
        "id", "amount", "currency",
        F.col("r_rate").alias("rate"),
        (F.col("amount") * F.col("r_rate")).alias("converted_amount"),
    )


@query(
    "timeseries_interpolate",
    oracle="""
    WITH fe AS (
      SELECT * FROM events WHERE (value IS NULL OR isfinite(value))
    ), hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(sum(CAST(FLOOR(value * 100) AS BIGINT)) AS DOUBLE) / (count(*) * 100) AS v
      FROM fe GROUP BY 1, 2
    ), b AS (
      SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi FROM fe
    ), cal AS (
      SELECT DISTINCT e.event_type, unnest(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS h
      FROM fe e, b
    ), g AS (
      SELECT c.event_type, c.h, epoch_us(c.h) // 3600000000 AS hidx, hourly.v
      FROM cal c LEFT JOIN hourly ON c.event_type = hourly.event_type AND c.h = hourly.h
    ), w AS (
      SELECT event_type, h, hidx, v,
             last_value(v IGNORE NULLS) OVER wb AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN hidx END IGNORE NULLS) OVER wb AS pi,
             first_value(v IGNORE NULLS) OVER wf AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN hidx END IGNORE NULLS) OVER wf AS ni
      FROM g
      WINDOW wb AS (PARTITION BY event_type ORDER BY hidx
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (PARTITION BY event_type ORDER BY hidx
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, h AS bucket_hour,
           CASE WHEN v IS NOT NULL THEN floor(v * 10000 + 0.5) / 10000
                WHEN pv IS NOT NULL AND nv IS NOT NULL
                THEN floor((pv + (nv - pv) * (CAST(hidx - pi AS DOUBLE) / CAST(ni - pi AS DOUBLE)))
                           * 10000 + 0.5) / 10000
           END AS value_interp,
           (v IS NULL AND pv IS NOT NULL AND nv IS NOT NULL) AS interpolated
    FROM w
    """,
    doc="time-series linear interpolation: hourly mean value per event type, "
    "missing hours filled by linear interpolation between nearest known "
    "points (IGNORE-NULLS window scan both directions); leading/trailing "
    "gaps stay NULL",
)
def q_timeseries_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Determinism note: the hourly mean is sum(integer cents)/count — exact
    # integer sums divided identically in both engines — so the interpolated
    # doubles are bit-equal, not merely close.  Scale: one shuffle for the
    # hourly pre-agg; the calendar join and both window passes run over the
    # |keys| × |hours| grid, which is ~10⁵× smaller than raw events.
    from amazon_kinesis_data_analytics_flinktableapi_spark.functions.scalar import finite_or_null

    (ev,) = load(spark, sf_dir, "events")
    # swallow the whole malformed record (calendar bounds included) — r14
    ev = ev.filter(finite_or_null("value"))
    hourly = ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("h")).agg(
        (F.sum(F.floor(F.col("value") * 100)).cast("double") / (F.count(F.lit(1)) * 100)).alias("v")
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"), F.date_trunc("hour", F.max("ts")).alias("hi")
    )
    cal = (
        ev.select("event_type").distinct()
        .crossJoin(F.broadcast(bounds))
        .select("event_type", F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("h"))
    )
    g = (
        cal.join(hourly, ["event_type", "h"], "left")
        .withColumn("hidx", F.expr("unix_micros(h) div 3600000000"))
    )
    w = Window.partitionBy("event_type").orderBy("hidx")
    wb = w.rowsBetween(Window.unboundedPreceding, 0)
    wf = w.rowsBetween(0, Window.unboundedFollowing)
    known_idx = F.when(F.col("v").isNotNull(), F.col("hidx"))
    pv, pi = F.last("v", ignorenulls=True).over(wb), F.last(known_idx, ignorenulls=True).over(wb)
    nv, ni = F.first("v", ignorenulls=True).over(wf), F.first(known_idx, ignorenulls=True).over(wf)
    frac = (F.col("hidx") - pi).cast("double") / (ni - pi).cast("double")
    interp = pv + (nv - pv) * frac
    return g.select(
        "event_type",
        F.col("h").alias("bucket_hour"),
        F.when(F.col("v").isNotNull(), half_up_round(F.col("v"), 4))
        .when(pv.isNotNull() & nv.isNotNull(), half_up_round(interp, 4))
        .alias("value_interp"),
        (F.col("v").isNull() & pv.isNotNull() & nv.isNotNull()).alias("interpolated"),
    )


@query(
    "lag_lead_gaps",
    oracle="""
    SELECT event_id, user_id,
           floor(COALESCE(epoch(ts - lag(ts) OVER w), -1) * 1000000 + 0.5) / 1000000
             AS secs_since_prev,
           lead(event_type) OVER w AS next_event_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS LAST, event_id)
    """,
    doc="lag/lead analytics: inter-event gap seconds + next event type per user",
)
def q_lag_lead_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULLS LAST pinned on both engines (Spark ASC default is NULLS
    # FIRST, DuckDB's is NULLS LAST) — see queries/mining.py cusum note
    (ev,) = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc_nulls_last("ts"), "event_id")
    gap = F.col("ts").cast("double") - F.lag("ts").over(w).cast("double")
    return ev.select(
        "event_id",
        "user_id",
        (F.floor(F.coalesce(gap, F.lit(-1.0)) * 1_000_000 + 0.5) / 1_000_000).alias("secs_since_prev"),
        F.lead("event_type").over(w).alias("next_event_type"),
    )


@query(
    "explode_token_frequencies",
    oracle="""
    WITH toks AS (
      SELECT unnest(list_filter(string_split_regex(trim(text, ' '), '[ \t\n\x0b\f\r]+'), t -> t <> '')) AS token
      FROM documents
    )
    SELECT token, count(*) AS freq
    FROM toks
    GROUP BY token
    HAVING count(*) >= 100
    """,
    doc="UDTF-style lateral explode: corpus token frequencies (the generator-function shape)",
)
def q_explode_token_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    from amazon_kinesis_data_analytics_flinktableapi_spark.functions.text import tokens

    (docs,) = load(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= 100)
    )


@query(
    "event_sequence_detect",
    oracle="""
    SELECT s.user_id, min(p.ts) AS first_conversion_ts,
           count(*) AS n_pairs
    FROM events s JOIN events p
      ON s.user_id = p.user_id
     AND s.event_type = 'signup' AND p.event_type = 'purchase'
     AND p.ts > s.ts AND p.ts <= s.ts + INTERVAL 6 HOUR
    GROUP BY s.user_id
    """,
    doc="CEP-style sequence detection (MATCH_RECOGNIZE analogue): signup "
    "followed by purchase within 6h, per user — interval self-join form",
)
def q_event_sequence_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: both sides pre-filtered to their step's event type BEFORE the
    # join (pushed to the scan), so the self-join shuffles two thin
    # event-subsets on user_id — never events×events.  The time predicate
    # is a residual filter on the equi-join.  For low-cardinality step
    # types at 100 TB the equi key is user_id (high cardinality) — no
    # skew/serialization concern.
    (ev,) = load(spark, sf_dir, "events")
    s = ev.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("s_ts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    pairs = s.join(
        p,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") > F.col("s_ts"))
        & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 6 HOURS")),
    )
    return pairs.groupBy("user_id").agg(
        F.min("p_ts").alias("first_conversion_ts"), F.count(F.lit(1)).alias("n_pairs")
    )


@query(
    "funnel_steps",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1
      GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      GROUP BY e.user_id
    )
    SELECT 'step1_signup' AS step, count(*) AS n_users FROM s1
    UNION ALL SELECT 'step2_click', count(*) FROM s2
    UNION ALL SELECT 'step3_purchase', count(*) FROM s3
    """,
    doc="ordered funnel: users reaching signup -> later click -> later "
    "purchase; each stage anchors on the previous stage's first timestamp",
)
def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: each stage is a filtered scan pre-aggregated to one row per
    # user BEFORE its join (the stage outputs shrink monotonically), and
    # every shuffle is on high-cardinality user_id.  Step counts are tiny
    # scalar aggregates unioned at the end.
    (ev,) = load(spark, sf_dir, "events")

    def stage(event_type: str, prev: DataFrame | None, prev_t: str, t_alias: str) -> DataFrame:
        e = ev.filter(F.col("event_type") == event_type).select("user_id", "ts")
        if prev is not None:
            e = e.join(prev, "user_id").filter(F.col("ts") > F.col(prev_t))
        return e.groupBy("user_id").agg(F.min("ts").alias(t_alias))

    s1 = stage("signup", None, "", "t1")
    s2 = stage("click", s1, "t1", "t2")
    s3 = stage("purchase", s2, "t2", "t3")
    return (
        s1.agg(F.count(F.lit(1)).alias("n_users")).select(F.lit("step1_signup").alias("step"), "n_users")
        .union(s2.agg(F.count(F.lit(1)).alias("n_users")).select(F.lit("step2_click").alias("step"), "n_users"))
        .union(s3.agg(F.count(F.lit(1)).alias("n_users")).select(F.lit("step3_purchase").alias("step"), "n_users"))
    )


@query(
    "timeseries_gap_fill",
    oracle="""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n
      FROM events GROUP BY 1, 2
    ), b AS (
      SELECT date_trunc('day', min(ts)) AS lo, date_trunc('day', max(ts)) AS hi
      FROM events
    ), cal AS (
      SELECT DISTINCT e.event_type, unnest(generate_series(b.lo, b.hi, INTERVAL 1 DAY)) AS day
      FROM events e, b
    )
    SELECT c.event_type, c.day, coalesce(d.n, 0) AS n_events
    FROM cal c LEFT JOIN daily d ON c.event_type = d.event_type AND c.day = d.day
    """,
    doc="time-series densification: per-key daily counts with calendar gap "
    "fill (sequence + explode + left join), zero-filled missing days",
)
def q_timeseries_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: the calendar is |keys| × |days| — tiny next to the fact table
    # — and the bounds row broadcasts, so the only real shuffle is the
    # daily pre-aggregation; the gap-fill join is broadcast on the
    # (pre-aggregated, small) daily side or the calendar side, never a
    # fact-table shuffle.
    (ev,) = load(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    bounds = ev.agg(
        F.date_trunc("day", F.min("ts")).alias("lo"), F.date_trunc("day", F.max("ts")).alias("hi")
    )
    cal = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("day"),
        )
    )
    return (
        cal.join(daily, ["event_type", "day"], "left")
        .select("event_type", "day", F.coalesce(F.col("n"), F.lit(0)).alias("n_events"))
    )


@query(
    "session_gaps_islands",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts))
                       > 21600000000
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events WHERE ts IS NOT NULL
    ), sessions AS (
      SELECT user_id, ts,
             CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM marked
    )
    SELECT user_id, session_id, count(*) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end
    FROM sessions
    GROUP BY user_id, session_id
    """,
    doc="sessionization via gaps-and-islands (batch twin of streaming session_window)",
)
def q_session_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The SQL-expressible equivalent of session_window (6h gap): marks a
    # session boundary at every >gap jump, prefix-sums boundaries into
    # session ids.  Two window passes over one shuffle on user_id.
    # Gap test compares integer MICROSECONDS on both sides — the earlier
    # double-seconds cast flipped exact-6h ties at ~1.7e9 s epochs (driver
    # hash mismatch at sf0.01 that sf0.001 never hit).
    (ev,) = load(spark, sf_dir, "events")
    # a NULL event time cannot be sessionized (same contract as streaming
    # session_window, whose watermark drops such rows) — exclude up front
    # on BOTH engines instead of letting engine-default NULL ordering
    # attach the row to an arbitrary session
    ev = ev.filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts")
    prev = F.lag("ts").over(w)
    new_session = F.when(
        prev.isNull() | ((F.unix_micros(F.col("ts")) - F.unix_micros(prev)) > 21_600_000_000), 1
    ).otherwise(0)
    marked = ev.select("user_id", "ts", new_session.alias("new_session"))
    session_id = F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    sessions = marked.select("user_id", "ts", session_id.alias("session_id"))
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@query(
    "cascaded_rollup",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h, event_type,
             count(*) AS n, sum(value) AS sv
      FROM events
      WHERE (value IS NULL OR isfinite(value))
      GROUP BY 1, 2
    ), daily AS (
      SELECT date_trunc('day', h) AS d, event_type,
             CAST(sum(n) AS BIGINT) AS n, sum(sv) AS sv
      FROM hourly GROUP BY 1, 2
    )
    SELECT 'hour' AS resolution, h AS bucket_start, event_type, n,
           floor(sv * 100 + 0.5) / 100 AS total_value
    FROM hourly
    UNION ALL
    SELECT 'day', d, event_type, n, floor(sv * 100 + 0.5) / 100
    FROM daily
    """,
    doc="hypertable-style cascaded rollup: hourly aggregates re-aggregated to daily",
)
def q_cascaded_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The continuous-aggregate pattern: compute the finest resolution once,
    # derive coarser resolutions from the aggregate (never rescanning raw
    # data).  At 100 TB the hourly layer is ~10⁵× smaller than raw events.
    # Non-finite value rows are swallowed (functions.scalar.finite_or_null;
    # r14 audit: one ±inf row silently saturated the rollup through Spark's
    # BIGINT floor() to ±2⁶³−1 while DuckDB kept double-inf).
    from amazon_kinesis_data_analytics_flinktableapi_spark.functions.scalar import finite_or_null

    (ev,) = load(spark, sf_dir, "events")
    ev = ev.filter(finite_or_null("value"))
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"))
    daily = hourly.groupBy(
        F.date_trunc("day", "h").alias("d"), "event_type"
    ).agg(F.sum("n").alias("n"), F.sum("sv").alias("sv"))
    h_out = hourly.select(
        F.lit("hour").alias("resolution"), F.col("h").alias("bucket_start"),
        "event_type", "n", half_up_round(F.col("sv"), 2).alias("total_value"),
    )
    d_out = daily.select(
        F.lit("day").alias("resolution"), F.col("d").alias("bucket_start"),
        "event_type", "n", half_up_round(F.col("sv"), 2).alias("total_value"),
    )
    return h_out.union(d_out)


#: m=1024 registers (b=10): SE = 1.04/√m ≈ 3.25%, and the linear-counting
#: regime reaches 2.5·m = 2560 distinct — so the test-data cardinalities
#: (15/150/1500 distinct users) all land in accurate regimes, clear of
#: raw-HLL's biased 2.5m–5m zone.  The remaining 50 hash bits cap rho at
#: 51, so the integer register sum Σ 2^(51−M_j) ≤ 1024·2^51 = 2^61 — no
#: BIGINT overflow under ANSI.
#:
#: alpha_1024 · m² · 2⁵¹ — the raw-HLL numerator, pre-multiplied in
#: Python and emitted as one repr() double literal on BOTH engines.  Why:
#: DuckDB parses plain float literals as DECIMAL, so spelling the
#: arithmetic inline would run under DECIMAL rules there and IEEE-double
#: rules in Spark — a silent cross-engine drift.
_HLL_NUMERATOR = repr((0.7213 / (1.0 + 1.079 / 1024.0)) * 1048576.0 * 2251799813685248.0)

#: shared portable-HLL sub-expressions (Spark and DuckDB texts are kept
#: BYTE-IDENTICAL where evaluation order affects double bits)
_HLL_RHO = "CASE WHEN w = 0 THEN 51 ELSE 51 - length(bin(w)) END"
_HLL_S = (
    "CAST(sum(CAST(pow(2.0, 51 - mj) AS BIGINT)) "
    "+ (1024 - count(*)) * 2251799813685248 AS DOUBLE)"
)
_HLL_EST = (
    f"CAST(FLOOR(CASE WHEN CAST({_HLL_NUMERATOR} AS DOUBLE) / s <= 2560.0 AND v > 0 "
    "THEN CAST(1024 AS DOUBLE) * ln(CAST(1024 AS DOUBLE) / v) "
    f"ELSE CAST({_HLL_NUMERATOR} AS DOUBLE) / s END) AS BIGINT)"
)


@query(
    "approx_sketches",
    oracle=f"""
    WITH h AS (
      SELECT event_type,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM events WHERE user_id IS NOT NULL
    ),
    regs AS (SELECT event_type, h % 1024 AS reg, h // 1024 AS w FROM h),
    per_reg AS (
      SELECT event_type, reg, max({_HLL_RHO}) AS mj
      FROM regs GROUP BY 1, 2
    ),
    hll AS (
      SELECT event_type, {_HLL_S} AS s, 1024 - count(*) AS v
      FROM per_reg GROUP BY 1
    ),
    users AS (SELECT event_type, {_HLL_EST} AS approx_users FROM hll),
    b AS (
      SELECT event_type, CAST(FLOOR(value * 1000) AS BIGINT) AS bin
      FROM events WHERE value IS NOT NULL AND isfinite(value)
    ),
    hist AS (SELECT event_type, bin, count(*) AS c FROM b GROUP BY 1, 2),
    cum AS (
      SELECT event_type, bin,
             sum(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
             sum(c) OVER (PARTITION BY event_type) AS nv
      FROM hist
    ),
    qs AS (
      SELECT event_type,
             CAST(min(CASE WHEN cum * 2 >= nv THEN bin END) AS DOUBLE) / 1000 AS q50,
             CAST(min(CASE WHEN cum * 20 >= nv * 19 THEN bin END) AS DOUBLE) / 1000 AS q95,
             CAST(min(CASE WHEN cum * 100 >= nv * 99 THEN bin END) AS DOUBLE) / 1000 AS q99
      FROM cum GROUP BY 1
    ),
    counts AS (SELECT event_type, count(*) AS n FROM events GROUP BY 1)
    SELECT c.event_type, u.approx_users, q.q50, q.q95, q.q99, c.n
    FROM counts c
    LEFT JOIN users u ON u.event_type = c.event_type
    LEFT JOIN qs q ON q.event_type = c.event_type
    """,
    doc="approximate sketches, portable edition (VERDICT r10 #4): HLL "
    "distinct users with a LITERAL register layout (md5-derived 60-bit "
    "hash, m=1024, integer-exact register sum) + fixed-width-bin quantile "
    "sketch per event type — every estimate hash-checked against DuckDB "
    "computing the same sketch; native-sketch accuracy stays gated by "
    "approx_sketches_bounds",
)
def q_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's sketch bundle, re-expressed so the ESTIMATES are
    deterministic and engine-portable (the KMV/CMS treatment, closing the
    registry's last rows-only row):

    - ``approx_users``: HyperLogLog with a pinned layout — register =
      ``h % 1024``, rank = leading-zero count of the remaining 50 bits + 1
      (``51 − bit_length``), registers combined via an INTEGER sum of
      ``2^(51−M_j)`` (exact, order-free — the double harmonic sum would
      be partition-order-dependent), absent registers contributing
      ``2^51``.  Raw estimate ``α·m²·2^51 / S`` with linear-counting
      small-range correction ``m·ln(m/V)`` — the branch decision compares
      bit-identical doubles on both engines, and the FLOOR→BIGINT output
      absorbs the ≤1-ulp ``ln`` divergence measured between JVM and
      libm (a minority of domain values differ in the last ulp; none
      within 1e-9 of an integer).  Accuracy vs exact counts is gated in
      tests/test_quality_gates.py.
    - ``q50/q95/q99``: first 1-milli-unit bin whose cumulative count
      crosses the rank — integer comparisons only (``cum·k ≥ n·q``),
      rank error bounded by bin width.
    - ``n``: exact per-type count.

    Scale shape: the register table is ≤ m rows per group after the
    map-side partial max, the histogram is mergeable sums, and both are
    fixed-size whatever the data volume — the same two shuffles at 100 TB
    as at sf0.01.  Native ``approx_count_distinct`` / ``percentile_approx``
    remain covered (and error-bounded) by ``approx_sketches_bounds``.

    Reference parity: the Flink job itself has no sketch surface; this is
    part of the LLM-pipeline tier (driver brief), kept output-compatible
    with the pre-r11 rows-only version (same six columns)."""
    from amazon_kinesis_data_analytics_flinktableapi_spark.functions.scalar import finite_or_null

    (ev,) = load(spark, sf_dir, "events")
    from amazon_kinesis_data_analytics_flinktableapi_spark.functions.text import md5_hash60

    regs = (
        ev.filter(F.col("user_id").isNotNull())
        .select(
            "event_type", md5_hash60(F.col("user_id").cast("string")).alias("h")
        )
        .select(
            "event_type",
            (F.col("h") % 1024).alias("reg"),
            F.expr("h div 1024").alias("w"),
        )
    )
    per_reg = regs.groupBy("event_type", "reg").agg(F.expr(f"max({_HLL_RHO})").alias("mj"))
    hll = per_reg.groupBy("event_type").agg(
        F.expr(_HLL_S).alias("s"), F.expr("1024 - count(*)").alias("v")
    )
    users = hll.select("event_type", F.expr(_HLL_EST).alias("approx_users"))

    b = ev.filter(F.col("value").isNotNull() & finite_or_null("value")).select(
        "event_type", F.expr("CAST(FLOOR(value * 1000) AS BIGINT)").alias("bin")
    )
    hist = b.groupBy("event_type", "bin").agg(F.count(F.lit(1)).alias("c"))
    wcum = Window.partitionBy("event_type").orderBy("bin")
    wall = Window.partitionBy("event_type")
    cum = hist.select(
        "event_type",
        "bin",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("nv"),
    )

    def cross(k: int, q: int, name: str):
        crossing = F.min(F.when(F.col("cum") * k >= F.col("nv") * q, F.col("bin")))
        return (crossing.cast("double") / F.lit(1000)).alias(name)

    qs = cum.groupBy("event_type").agg(
        cross(2, 1, "q50"), cross(20, 19, "q95"), cross(100, 99, "q99")
    )
    counts = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    return (
        counts.join(users, "event_type", "left")
        .join(qs, "event_type", "left")
        .select("event_type", "approx_users", "q50", "q95", "q99", "n")
    )


@query(
    "approx_sketches_bounds",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           count(DISTINCT user_id) AS exact_users,
           TRUE AS hll_in_bounds,
           TRUE AS q50_in_bounds,
           TRUE AS q95_in_bounds,
           TRUE AS q99_in_bounds
    FROM events
    GROUP BY event_type
    """,
    doc="VERDICT r8 #2 — the correctness bar for approx_sketches: each "
    "sketch estimate is asserted INSIDE its proven error bound against "
    "exactly-computed values, and the verdict is hash-checked (an "
    "estimate leaving its bound flips a boolean and fails the driver "
    "row, not just the row count)",
)
def q_approx_sketches_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounds-gate for the implementation-specific sketches.

    - ``approx_count_distinct(rsd=0.02)`` is HLL++ with standard error
      2%: the gate allows 5σ relative error plus a +5 absolute floor for
      small groups — |est − exact| ≤ 0.10·exact + 5.  Far looser than
      observed (~1%), tight enough that a broken sketch (off by a bucket
      width, double-counted merge) fails.
    - ``percentile_approx(…, 10000)`` guarantees RANK error ≤ n/10000:
      the gate asserts each approximate quantile lies between the exact
      interpolated percentiles at p ± 0.005 (50× the guaranteed rank
      slack, so data regeneration can't flake it; a sketch returning a
      wrong-bucket value still lands far outside).

    The oracle recomputes n and exact_users in DuckDB (pinning the exact
    side of every comparison) and expects TRUE for all four verdict
    columns — so the hash compare IS the bounds check.  Scale shape: one
    shuffle on event_type; countDistinct expands to a two-phase
    distinct-aggregate, and the rank-space quantile check materializes
    each group's FULL value multiset via sort_array(collect_list) —
    deliberately O(group size) in executor memory, which contradicts
    sketch scale on purpose: this is the VERIFICATION query that holds
    the exact answer up against the sketch, run at fixture/audit sizes
    (5 groups here).  The production sketch path it certifies
    (approx_sketches, kmv_distinct_sketch) never collects; at real group
    cardinalities bound the check with two percentile() calls at p±slack
    instead of collecting the array.
    """
    (ev,) = load(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("__hll"),
        F.percentile_approx("value", [0.5, 0.95, 0.99], 10000).alias("__q"),
        F.sort_array(F.collect_list("value")).alias("__v"),
    )
    nv = F.size("__v")

    def q_within(qi: int, p: float):
        # RANK-space bound, not interpolated-quantile space: the sketch
        # guarantees the returned value's rank is within n/accuracy of
        # p·n, and it always returns an ELEMENT of the multiset.  The
        # previous interpolated ±0.005-quantile band contains no data
        # element at all for small n (n=2, p=.5 → band ≈ [1.485, 1.515]
        # between values 0 and 3), so tiny adversarial groups failed the
        # gate with a CORRECT sketch.  Slack: ±(0.005·n + 1) ranks — same
        # intent at driver scale (~100 ranks at n=20k vs the guaranteed
        # 2), and the +1 makes it exact-neighbor-tolerant at any n.
        q = F.element_at("__q", qi)
        lo_i = F.greatest(F.lit(1), F.floor(nv * p - nv * 0.005 - 1).cast("int"))
        hi_i = F.least(nv, F.ceil(nv * p + nv * 0.005 + 1).cast("int"))
        in_bounds = (q >= F.element_at("__v", lo_i)) & (q <= F.element_at("__v", hi_i))
        # a group with zero non-NULL values has no quantile: vacuously true
        return F.when(nv == 0, F.lit(True)).otherwise(in_bounds)

    return agg.select(
        "event_type",
        "n",
        "exact_users",
        (
            F.abs(F.col("__hll") - F.col("exact_users"))
            <= F.col("exact_users") * 0.10 + F.lit(5)
        ).alias("hll_in_bounds"),
        q_within(1, 0.50).alias("q50_in_bounds"),
        q_within(2, 0.95).alias("q95_in_bounds"),
        q_within(3, 0.99).alias("q99_in_bounds"),
    )


@query(
    "kmv_distinct_sketch",
    oracle="""
    WITH h AS (
      SELECT DISTINCT event_type,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM events WHERE user_id IS NOT NULL
    ),
    topk AS (SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
             FROM h),
    agg AS (SELECT event_type, max(h) AS hk, count(*) AS m
            FROM topk WHERE rn <= 256 GROUP BY event_type)
    SELECT event_type,
           CASE WHEN m < 256 THEN m
                ELSE CAST(FLOOR(255 * (POW(2, 60) / CAST(hk AS DOUBLE))) AS BIGINT)
           END AS kmv_users
    FROM agg
    """,
    doc="deterministic distinct-count sketch: k-minimum-values (k=256) over "
    "the portable md5-derived 60-bit hash — the oracle-checkable sibling of "
    "approx_sketches' HLL (same estimate on ANY engine computing the same "
    "hash, unlike HLL whose register layout is implementation-specific)",
)
def q_kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV estimator: keep each group's k smallest distinct hash values;
    with h_k = the k-th smallest over hash space [0, 2^60), the density
    estimate is (k-1) / (h_k / 2^60).  Exact when the group has < k
    distinct values (every value is in the sketch).

    Scale shape: the sketch is MERGEABLE — union two k-smallest sets and
    re-take the k smallest.  The plan exploits that: per-input-partition
    k-smallest first (partial ``collect_set`` dedups map-side, sorted and
    sliced to k), then a merge of ≤ k×n_partitions survivors per group —
    the group shuffle never carries a group's full distinct set, which is
    what the naive distinct+window plan would do at 100 TB.  The i64→
    double conversion and the division are IEEE-identical on any engine,
    so the estimate — not just the sketch — is deterministic."""
    (ev,) = load(spark, sf_dir, "events")
    return kmv_distinct(ev, "event_type", "user_id", k=256).withColumnRenamed(
        "kmv_distinct", "kmv_users"
    )


def kmv_distinct(df: DataFrame, group_col: str, value_col: str, k: int = 256) -> DataFrame:
    """(group, kmv_distinct) — the mergeable KMV estimator described in
    ``q_kmv_distinct_sketch``; ``k`` dials accuracy (rel. error ≈ 1/√k)."""
    from amazon_kinesis_data_analytics_flinktableapi_spark.functions.text import md5_hash60

    # NULL values are excluded on BOTH sides (collect_set drops NULL hash
    # rows silently on the Spark side; the oracle filters explicitly) —
    # distinct-count conventionally ignores NULL
    hashed = df.filter(F.col(value_col).isNotNull()).select(
        F.spark_partition_id().alias("__p"),
        group_col,
        md5_hash60(F.col(value_col).cast("string")).alias("h"),
    )
    pre = hashed.groupBy("__p", group_col).agg(
        F.slice(F.array_sort(F.collect_set("h")), 1, k).alias("hs")
    )
    merged = (
        pre.select(group_col, F.explode("hs").alias("h"))
        .groupBy(group_col)
        .agg(F.slice(F.array_sort(F.collect_set("h")), 1, k).alias("hs"))
    )
    m = F.size("hs")
    hk = F.element_at("hs", m)
    est = F.when(m < k, m.cast("bigint")).otherwise(
        F.floor((k - 1) * (F.lit(float(2**60)) / hk.cast("double"))).cast("bigint")
    )
    return merged.select(group_col, est.alias("kmv_distinct"))


@query(
    "cogroup_asof_pandas",
    oracle="""
    WITH o AS (
      SELECT event_id AS id, ts AS order_time,
             CAST(FLOOR(value * 100) AS INTEGER) AS amount,
             event_type AS currency
      FROM events
      WHERE (value IS NULL OR isfinite(value))
    ), r AS (
      SELECT ts AS rate_time, event_type AS currency,
             CAST(FLOOR(value) AS INTEGER) % 97 + 2 AS rate
      FROM events
      WHERE event_id % 17 = 0 AND (value IS NULL OR isfinite(value))
    ), ranked AS (
      SELECT o.id, o.amount, o.currency, r.rate,
             row_number() OVER (PARTITION BY o.id
                                ORDER BY r.rate_time DESC NULLS LAST,
                                         r.rate DESC NULLS LAST) AS rn
      FROM o LEFT JOIN r
        ON o.currency = r.currency AND o.order_time >= r.rate_time
    )
    SELECT id, amount, currency, rate, amount * rate AS converted_amount
    FROM ranked WHERE rn = 1
    """,
    doc="co-grouped applyInPandas as-of merge: orders ⋈ rates cogrouped on "
    "currency, pd.merge_asof per group (Arrow batches; ties broken by "
    "sorting rates (time, rate) so last-wins == highest rate, matching the "
    "declarative as-of).  The cogroup surface is the Flink "
    "KeyedCoProcessFunction analogue; parallelism = group count, so "
    "high-cardinality keys are the scale case and per-key skew the risk.",
)
def q_cogroup_asof_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    (ev,) = load(spark, sf_dir, "events")
    orders, rates = _asof_orders_rates(ev)

    def merge(odf: "pd.DataFrame", rdf: "pd.DataFrame") -> "pd.DataFrame":
        odf = odf.sort_values(["order_time", "id"])
        # ascending (time, rate): merge_asof takes the LAST row at an equal
        # timestamp, so ties resolve to the highest rate — same rule as the
        # oracle's ORDER BY rate_time DESC, rate DESC ... rn = 1.
        # NULL times never match the oracle's >= predicate, so NaT rates
        # are dropped and NaT orders bypass the merge (merge_asof raises on
        # unsorted/NaT keys — adversarial-fixture crash, not a sort nicety)
        # SQL NULL = NULL is not a match: cogroup puts NULL-currency rows
        # of both sides in ONE group, but the oracle's equi-join predicate
        # never pairs them — treat the NULL-key group's rate side as empty
        if len(odf) and odf["currency"].isna().all():
            rdf = rdf.iloc[0:0]
        rdf = (
            rdf.drop(columns=["currency"])
            .dropna(subset=["rate_time"])
            .sort_values(["rate_time", "rate"])
        )
        known = odf["order_time"].notna()
        left = odf[known]
        if len(rdf) and len(left):
            m = pd.merge_asof(
                left, rdf, left_on="order_time", right_on="rate_time", direction="backward"
            )
        else:
            m = left.copy()
            m["rate"] = pd.NA
        if not known.all():
            nn = odf[~known].copy()
            nn["rate"] = pd.NA
            m = pd.concat([m, nn], ignore_index=True)
        m["rate"] = m["rate"].astype("Int32")
        m["converted_amount"] = (m["amount"].astype("Int32") * m["rate"]).astype("Int32")
        return m[["id", "amount", "currency", "rate", "converted_amount"]]

    return (
        orders.groupBy("currency")
        .cogroup(rates.groupBy("currency"))
        .applyInPandas(merge, "id bigint, amount int, currency string, rate int, converted_amount int")
    )


@query(
    "table_profile",
    oracle="""
    SELECT 'o_custkey' AS column_name, count(*) AS n_rows,
           count(*) - count(o_custkey) AS n_nulls,
           count(DISTINCT o_custkey) AS n_distinct
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
           count(DISTINCT o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
           count(DISTINCT o_orderpriority)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
           count(DISTINCT o_totalprice)
    FROM orders
    """,
    doc="table profiling (ANALYZE-style data-quality stats): per-column row/"
    "null/exact-distinct counts in ONE scan — the pre-ingestion audit every "
    "pipeline runs before trusting a new drop of data",
)
def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: ONE pass over the fact — Catalyst plans multiple count(DISTINCT)
    # via a single Expand (rows ×4 pre-shuffle, map-side partially
    # aggregated), not four scans; the oracle's UNION ALL of four scans is
    # the semantic twin, not the plan twin.  For approximate profiling at
    # 100 TB swap count(DISTINCT) for approx_count_distinct and the Expand
    # disappears entirely.
    (orders,) = load(spark, sf_dir, "orders")
    agg = orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            e
            for c in ("o_custkey", "o_orderstatus", "o_orderpriority", "o_totalprice")
            for e in (
                (F.count(F.lit(1)) - F.count(c)).alias(f"nn_{c}"),
                F.countDistinct(c).alias(f"nd_{c}"),
            )
        ],
    )
    return agg.select(
        F.expr(
            "stack(4, "
            + ", ".join(
                f"'{c}', n_rows, nn_{c}, nd_{c}"
                for c in ("o_custkey", "o_orderstatus", "o_orderpriority", "o_totalprice")
            )
            + ") AS (column_name, n_rows, n_nulls, n_distinct)"
        )
    )


@query(
    "integrity_audit",
    oracle="""
    SELECT 'lineitem_orphan_order' AS check_name, count(*) AS n_violations
    FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
    UNION ALL
    SELECT 'order_orphan_customer', count(*)
    FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
    UNION ALL
    SELECT 'lineitem_orphan_part', count(*)
    FROM lineitem WHERE l_partkey NOT IN (SELECT p_partkey FROM part)
    UNION ALL
    SELECT 'order_nonpositive_price', count(*)
    FROM orders WHERE o_totalprice <= 0
    """,
    doc="referential-integrity + validity audit: orphan foreign keys via "
    "anti joins and a rule check, one row per constraint — zero counts are "
    "the attestation that the drop is consistent",
)
def q_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: each orphan check is a LEFT ANTI join on the key — the dim key
    # sets (orders/customer/part keys) broadcast when they fit, else AQE
    # picks shuffle hash; counts are map-side partial.  NOT IN with a
    # nullable subquery would be the SQL trap (NULL semantics) — keys here
    # are non-null by construction, and the Spark side uses anti joins
    # which have no such edge.
    li, orders, customer, part = load(spark, sf_dir, "lineitem", "orders", "customer", "part")

    def check(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_violations")).select(
            F.lit(name).alias("check_name"), "n_violations"
        )

    return (
        check("lineitem_orphan_order", li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti"))
        .union(check("order_orphan_customer", orders.join(customer, orders.o_custkey == customer.c_custkey, "left_anti")))
        .union(check("lineitem_orphan_part", li.join(part, li.l_partkey == part.p_partkey, "left_anti")))
        .union(check("order_nonpositive_price", orders.filter(F.col("o_totalprice") <= 0)))
    )


@query(
    "cms_frequency_sketch",
    oracle="""
    WITH toks AS (
      SELECT unnest(list_filter(string_split_regex(trim(text, ' '), '[ \t\n\x0b\f\r]+'), t -> t <> '')) AS tok
      FROM documents
    ),
    cells AS (
      SELECT d, ('0x' || substr(md5('cms' || d || ':' || tok), 1, 15))::BIGINT % 256 AS bucket,
             count(*) AS c
      FROM toks CROSS JOIN range(4) t(d)
      GROUP BY 1, 2
    ),
    exact AS (
      SELECT tok, count(*) AS exact_n FROM toks GROUP BY tok
      ORDER BY exact_n DESC, tok LIMIT 20
    ),
    probes AS (
      SELECT e.tok, e.exact_n, t.d,
             ('0x' || substr(md5('cms' || t.d || ':' || e.tok), 1, 15))::BIGINT % 256 AS bucket
      FROM exact e CROSS JOIN range(4) t(d)
    )
    SELECT p.tok, p.exact_n, CAST(min(c.c) AS BIGINT) AS cms_estimate
    FROM probes p JOIN cells c ON c.d = p.d AND c.bucket = p.bucket
    GROUP BY p.tok, p.exact_n
    """,
    doc="Count-Min frequency sketch (Cormode & Muthukrishnan 2005): depth-4 "
    "x width-256 counter grid over portable md5 row hashes, probed with the "
    "exact top-20 tokens — cell counts are pure sums, so unlike Misra-Gries "
    "the sketch is order-independent and the oracle hash-checks estimates",
)
def q_cms_frequency_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS estimate(x) = min over rows d of cell[d][h_d(x)]; every cell is
    an order-independent SUM, so the sketch — and therefore the estimate —
    is identical under any partitioning, engine, or merge order (the
    property that makes CMS the streaming/distributed heavy-hitter sketch:
    partial sketches from any number of executors or micro-batches merge
    by cell-wise addition).  Estimates only OVERCOUNT (collisions add),
    never undercount — pinned in tests.

    Scale shape: one shuffle on (row, bucket) — the grid is depth x width
    = 1024 cells regardless of corpus size; the probe side is a broadcast
    of top-k x depth lookups.  At 100 TB the same plan holds: the sketch
    stays 1024 cells."""
    from amazon_kinesis_data_analytics_flinktableapi_spark.functions.text import md5_hash60, tokens

    DEPTH, WIDTH = 4, 256
    (docs,) = load(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens("text")).alias("tok")).cache()

    def bucket(d: int, tok_col) -> F.Column:
        return md5_hash60(F.concat(F.lit(f"cms{d}:"), tok_col)) % WIDTH

    cells = (
        toks.select(
            "tok",
            F.explode(
                F.array(*[
                    F.struct(F.lit(d).alias("d"), bucket(d, F.col("tok")).alias("bucket"))
                    for d in range(DEPTH)
                ])
            ).alias("e"),
        )
        .groupBy(F.col("e.d").alias("d"), F.col("e.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    exact = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), "tok")
        .limit(20)
    )
    probes = exact.select(
        "tok",
        "exact_n",
        F.explode(
            F.array(*[
                F.struct(F.lit(d).alias("d"), bucket(d, F.col("tok")).alias("bucket"))
                for d in range(DEPTH)
            ])
        ).alias("e"),
    ).select("tok", "exact_n", F.col("e.d").alias("d"), F.col("e.bucket").alias("bucket"))
    return (
        cells.join(F.broadcast(probes), ["d", "bucket"])
        .groupBy("tok", "exact_n")
        .agg(F.min("c").cast("bigint").alias("cms_estimate"))
    )


@query(
    "recursive_ewma_rates",
    oracle="""
    WITH RECURSIVE base AS (
      SELECT event_type AS currency, ts AS rate_time,
             CAST(FLOOR(value) AS INTEGER) % 97 + 2 AS rate
      FROM events
      WHERE event_id % 17 = 0 AND (value IS NULL OR isfinite(value))
    ),
    seq AS (
      SELECT currency, rate,
             row_number() OVER (PARTITION BY currency ORDER BY rate_time, rate) AS rn
      FROM base
    ),
    head AS (SELECT currency, rate, rn FROM seq WHERE rn <= 50),
    ew(currency, rn, rate, ewma) AS (
      SELECT currency, rn, rate, CAST(rate AS DOUBLE) FROM head WHERE rn = 1
      UNION ALL
      SELECT h.currency, h.rn, h.rate, 0.25 * h.rate + 0.75 * e.ewma
      FROM head h JOIN ew e ON h.currency = e.currency AND h.rn = e.rn + 1
    )
    SELECT currency, rn, rate,
           floor(ewma * 1000000 + 0.5) / 1000000 AS ewma
    FROM ew
    """,
    doc="recursive CTE (Spark 4 WITH RECURSIVE, UNION ALL form): per-currency "
    "EWMA over the first 50 rates — a linear recursion whose fp op chain "
    "(0.25·x + 0.75·prev, both correctly-rounded) is identical in any IEEE "
    "engine, so the recursive surface itself is oracle-hash-checked",
)
def q_recursive_ewma_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's recursive CTEs execute one batch per recursion level, so
    depth is the cost driver: the sequence is capped at 50 rows per key
    (depth 50 regardless of data size — at scale you shard long series
    into bounded segments or use the applyInPandasWithState EWMA in
    streaming/windows.py, which this query's recursion cross-checks).
    Spark supports only the UNION ALL recursion form (no fixpoint dedup),
    which a linear per-key sequence satisfies naturally: each level joins
    exactly the next row number.

    The recursive TERM's static input is MATERIALIZED first (r17,
    optimization guide §2.4/§3.3): each recursion level re-executes its
    whole subtree, so with ``head`` left as a plain CTE the events scan +
    per-currency row_number sort ran once PER LEVEL — 50 scans and 50
    window sorts for a ≤50-rows-per-key frame (measured 11.1 s at
    sf0.01).  ``localCheckpoint`` pins the tiny head frame (≤ 50 ×
    |currencies| rows) so every level joins the materialized block
    instead (measured 5.0 s warm / 6.0 s cold — the residual is the
    recursion's inherent one-batch-per-level execution; same rows, same
    recursion, oracle hash unchanged)."""
    (ev,) = load(spark, sf_dir, "events")
    ev.createOrReplaceTempView("__ewma_events")
    head = spark.sql("""
      WITH base AS (
        SELECT event_type AS currency, ts AS rate_time,
               CAST(FLOOR(value) AS INT) % 97 + 2 AS rate
        FROM __ewma_events
        -- non-finite swallow (no isfinite() in Spark SQL — spelled out;
        -- see functions.scalar.finite_or_null)
        WHERE event_id % 17 = 0
          AND (value IS NULL OR (NOT isnan(value)
               AND abs(value) <> CAST('Infinity' AS DOUBLE)))
      ),
      seq AS (
        SELECT currency, rate,
               row_number() OVER (PARTITION BY currency ORDER BY rate_time, rate) AS rn
        FROM base
      )
      SELECT currency, rate, rn FROM seq WHERE rn <= 50
    """).localCheckpoint()
    head.createOrReplaceTempView("__ewma_head")
    return spark.sql("""
      WITH RECURSIVE ew(currency, rn, rate, ewma) AS (
        SELECT currency, rn, rate, CAST(rate AS DOUBLE) FROM __ewma_head WHERE rn = 1
        UNION ALL
        SELECT h.currency, h.rn, h.rate, 0.25 * h.rate + 0.75 * e.ewma
        FROM __ewma_head h JOIN ew e ON h.currency = e.currency AND h.rn = e.rn + 1
      )
      SELECT currency, rn, rate,
             floor(ewma * 1000000 + 0.5) / 1000000 AS ewma
      FROM ew
    """)


@query(
    "variant_semistructured",
    oracle="""
    WITH j AS (
      SELECT event_id,
             '{"id": ' || event_id || ', "user": {"uid": ' || user_id
               || '}, "tags": ["' || event_type || '", "evt"]}' AS payload
      FROM events WHERE event_id % 50 = 0 AND user_id IS NOT NULL
    )
    SELECT event_id,
           json_extract(payload, '$.user.uid')::BIGINT AS uid,
           json_extract_string(payload, '$.tags[0]') AS tag0,
           json_extract_string(payload, '$.tags[1]') AS tag1,
           json_extract(payload, '$.missing')::BIGINT AS missing
    FROM j
    """,
    doc="semi-structured VARIANT path (Spark 4): parse_json into the binary "
    "VARIANT type, typed variant_get extraction of nested object / array "
    "paths, try_variant_get NULL on absent paths — the schema-on-read "
    "surface for ragged JSON columns, oracle-twinned by DuckDB JSON paths",
)
def q_variant_semistructured(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT stores parsed JSON as a binary tree — path access skips
    re-tokenizing the document per extraction, the practical difference
    from get_json_object at scale when many fields are pulled from wide
    semi-structured rows.  The JSON here is constructed from typed
    columns (ints/strings only: float stringification differs between
    engines) so the oracle sees the byte-identical document."""
    (ev,) = load(spark, sf_dir, "events")
    ev.filter((F.col("event_id") % 50 == 0) & F.col("user_id").isNotNull()) \
        .createOrReplaceTempView("__variant_events")
    return spark.sql("""
      WITH j AS (
        SELECT event_id,
               concat('{"id": ', event_id, ', "user": {"uid": ', user_id,
                      '}, "tags": ["', event_type, '", "evt"]}') AS payload
        FROM __variant_events
      ),
      v AS (SELECT event_id, parse_json(payload) AS var FROM j)
      SELECT event_id,
             variant_get(var, '$.user.uid', 'bigint') AS uid,
             variant_get(var, '$.tags[0]', 'string') AS tag0,
             variant_get(var, '$.tags[1]', 'string') AS tag1,
             try_variant_get(var, '$.missing', 'bigint') AS missing
      FROM v
    """)


@query(
    "winsorize_outliers",
    oracle="""
    WITH v AS (
      SELECT event_type, event_id, CAST(FLOOR(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL AND isfinite(value)
    ),
    ranked AS (
      SELECT event_type, event_id, cents,
             row_number() OVER (PARTITION BY event_type ORDER BY cents, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM v
    ),
    bounds AS (
      SELECT event_type,
             min(CASE WHEN rn = (n * 5 + 99) // 100 THEN cents END) AS lo,
             min(CASE WHEN rn = n - (n * 5 + 99) // 100 + 1 THEN cents END) AS hi
      FROM ranked GROUP BY event_type
    )
    SELECT r.event_type, any_value(b.lo) AS lo_cents, any_value(b.hi) AS hi_cents,
           CAST(sum(CASE WHEN r.cents < b.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
           CAST(sum(CASE WHEN r.cents > b.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
           CAST(FLOOR(sum(greatest(b.lo, least(b.hi, r.cents))) * 1.0 / count(*)) AS BIGINT)
             AS winsorized_mean_cents
    FROM ranked r JOIN bounds b USING (event_type)
    GROUP BY r.event_type
    """,
    doc="per-group winsorization at the 5th/95th ORDER STATISTICS (rank-"
    "based, not interpolated — engine-exact where percentile interpolation "
    "is not): clamp bounds, clamp counts, and the winsorized mean in "
    "integer cents — the outlier-robust normalization step of a cleaning "
    "pipeline",
)
def q_winsorize_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounds are the k-th order statistics with k = ceil(0.05·n) computed
    in INTEGER arithmetic ((5n+99) div 100) and values pre-quantized to
    integer cents — no percentile interpolation anywhere, so every engine
    lands on the identical element.  Scale shape: one shuffle on the
    group key for the rank window, a groups-sized bounds table joined
    back broadcast, and integer aggregation; rank-based bounds beat
    interpolated percentiles at scale anyway (no double pass over
    unaggregatable state)."""
    from pyspark.sql import Window

    from amazon_kinesis_data_analytics_flinktableapi_spark.functions.scalar import finite_or_null

    (ev,) = load(spark, sf_dir, "events")
    # NOT NULL was already required; non-finite joins the exclusion (r14)
    v = ev.filter(F.col("value").isNotNull() & finite_or_null("value")).select(
        "event_type", "event_id", F.floor(F.col("value") * 100).cast("bigint").alias("cents")
    )
    w = Window.partitionBy("event_type").orderBy("cents", "event_id")
    wc = Window.partitionBy("event_type")
    ranked = v.select(
        "event_type", "cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    bounds = ranked.groupBy("event_type").agg(
        F.min(F.when(F.col("rn") == F.floor((F.col("n") * 5 + 99) / 100), F.col("cents"))).alias("lo"),
        F.min(
            F.when(
                F.col("rn") == F.col("n") - F.floor((F.col("n") * 5 + 99) / 100) + 1,
                F.col("cents"),
            )
        ).alias("hi"),
    )
    clamped = ranked.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        F.col("lo"), F.col("hi"), F.col("cents"),
        F.greatest(F.col("lo"), F.least(F.col("hi"), F.col("cents"))).alias("wcents"),
    )
    return clamped.groupBy("event_type").agg(
        F.any_value("lo").alias("lo_cents"),
        F.any_value("hi").alias("hi_cents"),
        F.sum(F.when(F.col("cents") < F.col("lo"), 1).otherwise(0)).cast("bigint").alias("n_below"),
        F.sum(F.when(F.col("cents") > F.col("hi"), 1).otherwise(0)).cast("bigint").alias("n_above"),
        F.floor(F.sum("wcents") * F.lit(1.0) / F.count(F.lit(1))).cast("bigint")
        .alias("winsorized_mean_cents"),
    )


@query(
    "xml_roundtrip_extract",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM events WHERE event_id % 40 = 0 AND user_id IS NOT NULL
    """,
    doc="XML ingestion surface (Spark 4 from_xml): per-row XML documents "
    "parsed against a declared schema and the typed fields extracted back "
    "— roundtrip-attested (oracle = the original columns), the same "
    "self-certifying pattern as the kinesis sink roundtrip",
)
def q_xml_roundtrip_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parsing XML event payloads is the same schema-on-read contract as
    the reference's JSON deserialization (S2) in a second wire format:
    from_xml binds elements to a declared struct, type-casting on the
    way.  The XML is constructed from typed int/string columns so the
    roundtrip is value-exact; a parse or binding regression breaks the
    hash, not just a count."""
    from pyspark.sql.functions import from_xml

    (ev,) = load(spark, sf_dir, "events")
    xml = ev.filter((F.col("event_id") % 40 == 0) & F.col("user_id").isNotNull()).select(
        F.concat(
            F.lit("<event><id>"), F.col("event_id"),
            F.lit("</id><uid>"), F.col("user_id"),
            F.lit("</uid><kind>"), F.col("event_type"),
            F.lit("</kind></event>"),
        ).alias("payload")
    )
    parsed = xml.select(
        from_xml(
            F.col("payload"),
            "id bigint, uid bigint, kind string",
        ).alias("e")
    )
    return parsed.select(
        F.col("e.id").alias("event_id"),
        F.col("e.uid").alias("user_id"),
        F.col("e.kind").alias("event_type"),
    )


@query(
    "kmv_set_ops",
    oracle="""
    WITH h AS (
      SELECT DISTINCT event_type,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM events
      WHERE user_id IS NOT NULL AND event_type IN ('view', 'click')
    ),
    sk AS (
      SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM h
    ),
    ka AS (SELECT h FROM sk WHERE event_type = 'view' AND rn <= 256),
    kb AS (SELECT h FROM sk WHERE event_type = 'click' AND rn <= 256),
    uni AS (
      SELECT h, row_number() OVER (ORDER BY h) AS rn
      FROM (SELECT h FROM ka UNION SELECT h FROM kb)
    ),
    ku AS (SELECT h FROM uni WHERE rn <= 256),
    stats AS (
      SELECT (SELECT count(*) FROM ku) AS m_u,
             (SELECT max(h) FROM ku) AS hk_u,
             (SELECT count(*) FROM ku
              WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb)) AS j_num
    )
    SELECT
      CAST(CASE WHEN m_u < 256 THEN m_u
                ELSE CAST(FLOOR(255 * (POW(2, 60) / CAST(hk_u AS DOUBLE))) AS BIGINT)
           END AS BIGINT) AS est_union,
      CAST(j_num AS BIGINT) AS sketch_overlap,
      CAST(CASE WHEN m_u < 256 THEN j_num
                ELSE CAST(FLOOR(j_num * CAST(FLOOR(255 * (POW(2, 60) / CAST(hk_u AS DOUBLE)))
                                             AS BIGINT) / 256.0) AS BIGINT)
           END AS BIGINT) AS est_intersect
    FROM stats
    """,
    doc="KMV sketch ALGEBRA: |A∪B| and |A∩B| estimated purely from the two "
    "per-set k-minimum-values sketches (union sketch = k smallest of the "
    "merged sketches; membership of a union-sketch element in a per-set "
    "sketch is EXACT by the KMV property) — the mergeable set-operation "
    "layer a distinct-count sketch needs to be useful across partitions",
)
def q_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-only set operations: no raw-set pass anywhere after the
    initial per-set sketches — at 100 TB the sketches (256 longs each)
    travel to one place and every estimate derives from them.  The
    intersection estimator is Jaccard-from-KMV (Beyer et al. 2007):
    elements of the union sketch present in both per-set sketches form
    an exact sample of A∩B within the k smallest of A∪B, so
    est = overlap/k · est_union; when the union holds fewer than k
    distinct values everything is exact.  All arithmetic is the same
    correctly-rounded double shape as kmv_distinct_sketch."""
    from pyspark.sql import Window

    from amazon_kinesis_data_analytics_flinktableapi_spark.functions.text import md5_hash60

    K = 256
    (ev,) = load(spark, sf_dir, "events")
    h = (
        ev.filter(F.col("user_id").isNotNull() & F.col("event_type").isin("view", "click"))
        .select("event_type", md5_hash60(F.col("user_id").cast("string")).alias("h"))
        .distinct()
    )
    w = Window.partitionBy("event_type").orderBy("h")
    sk = h.select("event_type", "h", F.row_number().over(w).alias("rn")).filter(F.col("rn") <= K)
    ka = sk.filter(F.col("event_type") == "view").select("h")
    kb = sk.filter(F.col("event_type") == "click").select("h")
    # global row_number over the sketch UNION — measured-small, bounded by
    # sketch size: the input is at most 2k = 512 rows by construction (two
    # k-smallest sketches), at ANY stream scale, so the single-partition
    # window is a constant-cost driver-class step, not a data funnel
    # (whitelisted by name in tests/test_plans.py GLOBAL_WINDOW_BOUNDED)
    uni = (
        ka.union(kb).distinct()
        .select("h", F.row_number().over(Window.orderBy("h")).alias("rn"))
        .filter(F.col("rn") <= K)
        .select("h")
    )
    ku = uni
    both = (
        ku.join(ka.withColumnRenamed("h", "ha"), ku["h"] == F.col("ha"), "left_semi")
        .join(kb.withColumnRenamed("h", "hb"), F.col("h") == F.col("hb"), "left_semi")
    )
    stats = (
        ku.agg(F.count(F.lit(1)).alias("m_u"), F.max("h").alias("hk_u"))
        .crossJoin(both.agg(F.count(F.lit(1)).alias("j_num")))
    )
    est_union = F.when(F.col("m_u") < K, F.col("m_u")).otherwise(
        F.floor(255 * (F.lit(float(2**60)) / F.col("hk_u").cast("double"))).cast("bigint")
    )
    return stats.select(
        est_union.cast("bigint").alias("est_union"),
        F.col("j_num").cast("bigint").alias("sketch_overlap"),
        F.when(F.col("m_u") < K, F.col("j_num"))
        .otherwise(F.floor(F.col("j_num") * est_union.cast("bigint") / F.lit(256.0)).cast("bigint"))
        .cast("bigint")
        .alias("est_intersect"),
    )


@query(
    "rolling_anomaly_flags",
    oracle="""
    WITH hourly AS (
      -- ts IS NOT NULL: an hourly series has no bucket for an unknown
      -- hour, and (found empirically) DuckDB 1.0.0's parallel window
      -- sort places a NULL ORDER BY key NONDETERMINISTICALLY (NULL-last
      -- on one run, mid-partition on the next) — the adversarial sweep
      -- flaked on exactly this
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(sum(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events
      WHERE ts IS NOT NULL AND (value IS NULL OR isfinite(value))
      GROUP BY 1, 2
    ),
    w AS (
      SELECT event_type, h, cents,
             count(*) OVER win AS wn,
             sum(cents) OVER win AS ws,
             sum(cents * cents) OVER win AS ws2
      FROM hourly
      WINDOW win AS (PARTITION BY event_type ORDER BY h
                     ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, h AS bucket_hour, cents,
           CAST(ws AS BIGINT) AS win_sum,
           CAST(wn AS BIGINT) AS win_n,
           (wn >= 3 AND
            (cents * wn - ws) * (cents * wn - ws)
              > 9 * (ws2 * wn - ws * ws)) AS is_anomaly
    FROM w
    """,
    doc="rolling anomaly flags on the hourly value series: |x − μ_win| > "
    "3σ_win over a 6-hour trailing window, evaluated ENTIRELY in integer "
    "arithmetic — (x·n − Σ)² > 9·(n·Σx² − (Σx)²) is the 3-sigma test "
    "cleared of divisions and square roots, so the flags are engine-exact "
    "(no float variance, no sqrt rounding)",
)
def q_rolling_anomaly_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3σ outlier detection without floats: with integer window sums
    Σ and Σx² over n points, |x−μ|>3σ  ⇔  (x·n−Σ)² > 9·(n·Σx²−Σ²) after
    multiplying both sides by n² — every quantity is an exact BIGINT
    (cents ≤ ~1e5, squares × window ≤ 2^50), so the comparison can never
    flip between engines the way a float σ near the threshold can.
    Scale: one shuffle for the hourly pre-agg, one per-key ordered window
    pass over the |keys|×|hours| grid."""
    from pyspark.sql import Window

    from amazon_kinesis_data_analytics_flinktableapi_spark.functions.scalar import finite_or_null

    (ev,) = load(spark, sf_dir, "events")
    # NULL event times are excluded from the hourly series on BOTH
    # engines (see the oracle comment — also dodges a DuckDB 1.0.0
    # nondeterministic window sort over NULL ORDER BY keys); non-finite
    # values are swallowed before the cents binding (r14)
    hourly = (
        ev.filter(F.col("ts").isNotNull() & finite_or_null("value"))
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.sum(F.floor(F.col("value") * 100)).cast("bigint").alias("cents"))
    )
    win = Window.partitionBy("event_type").orderBy("h").rowsBetween(-6, -1)
    w = hourly.select(
        "event_type",
        "h",
        "cents",
        F.count(F.lit(1)).over(win).alias("wn"),
        F.sum("cents").over(win).alias("ws"),
        F.sum(F.col("cents") * F.col("cents")).over(win).alias("ws2"),
    )
    dev = F.col("cents") * F.col("wn") - F.col("ws")
    var_n3 = F.col("ws2") * F.col("wn") - F.col("ws") * F.col("ws")
    return w.select(
        "event_type",
        F.col("h").alias("bucket_hour"),
        "cents",
        F.col("ws").cast("bigint").alias("win_sum"),
        F.col("wn").cast("bigint").alias("win_n"),
        ((F.col("wn") >= 3) & (dev * dev > 9 * var_n3)).alias("is_anomaly"),
    )


@query(
    "join_key_skew_report",
    oracle="""
    WITH k AS (
      SELECT o_custkey AS key, count(*) AS n
      FROM orders GROUP BY o_custkey
    ),
    tot AS (SELECT count(*) AS n_keys, sum(n) AS n_rows, max(n) AS max_n FROM k),
    top AS (
      SELECT key, n, row_number() OVER (ORDER BY n DESC, key) AS rn FROM k
    )
    SELECT t.rn AS rank, t.key AS hot_key, t.n AS n_rows_key,
           CAST(tot.n_keys AS BIGINT) AS n_keys,
           CAST(tot.n_rows AS BIGINT) AS n_rows,
           CAST(FLOOR(t.n * 1000.0 * tot.n_keys / tot.n_rows) AS BIGINT)
             AS skew_x1000
    FROM top t CROSS JOIN tot
    WHERE t.rn <= 10
    """,
    doc="join-key skew report: top-10 hottest o_custkey values with their "
    "skew factor (key rows ÷ mean rows per key, ×1000 integer) — the "
    "pre-flight diagnostic that decides between a plain shuffle join, "
    "AQE skew splitting, and explicit salting (operators/skew.py)",
)
def q_join_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew is the silent killer of shuffle joins; this is the one-scan
    report you run BEFORE keying a 100 TB join.  Plan: one groupBy on the
    key, a 1-row global aggregate broadcast back, a top-k rank — the
    report costs one shuffle of (key, count) pairs.  skew_x1000 uses
    exact integer arithmetic (n·1000·n_keys / n_rows floored), so the
    report itself is oracle-checkable."""
    from pyspark.sql import Window

    (orders,) = load(spark, sf_dir, "orders")
    k = orders.groupBy(F.col("o_custkey").alias("key")).agg(F.count(F.lit(1)).alias("n"))
    tot = k.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_rows"),
    )
    # distributed TakeOrdered first, then rank the 10 survivors — a global
    # row_number window would funnel every key through one partition
    top10 = k.orderBy(F.col("n").desc(), "key").limit(10)
    top = top10.select(
        "key", "n", F.row_number().over(Window.orderBy(F.col("n").desc(), "key")).alias("rn")
    )
    return top.crossJoin(F.broadcast(tot)).select(
        F.col("rn").alias("rank"),
        F.col("key").alias("hot_key"),
        F.col("n").alias("n_rows_key"),
        F.col("n_keys").cast("bigint").alias("n_keys"),
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.floor(F.col("n") * F.lit(1000.0) * F.col("n_keys") / F.col("n_rows"))
        .cast("bigint")
        .alias("skew_x1000"),
    )


@query(
    "binned_quantile_estimate",
    oracle="""
    WITH b AS (
      SELECT event_type, CAST(FLOOR(value * 100) AS BIGINT) // 10 AS bin
      FROM events WHERE value IS NOT NULL AND isfinite(value)
    ),
    hist AS (SELECT event_type, bin, count(*) AS c FROM b GROUP BY 1, 2),
    cum AS (
      SELECT event_type, bin, c,
             sum(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
             sum(c) OVER (PARTITION BY event_type) AS n
      FROM hist
    )
    SELECT event_type,
           CAST(min(CASE WHEN cum * 2 >= n THEN bin END) * 10 AS BIGINT) AS p50_cents,
           CAST(min(CASE WHEN cum * 20 >= n * 19 THEN bin END) * 10 AS BIGINT) AS p95_cents,
           CAST(min(CASE WHEN cum * 100 >= n * 99 THEN bin END) * 10 AS BIGINT) AS p99_cents
    FROM cum GROUP BY event_type
    """,
    doc="deterministic quantile estimates from a fixed-width bin histogram "
    "(10-cent bins): p50/p95/p99 as the first bin whose cumulative count "
    "crosses the rank — integer comparisons only (cum·k ≥ n·q, no "
    "division), mergeable (bin counts are sums), the oracle-checkable "
    "sibling of approx_sketches' engine-specific quantile sketch",
)
def q_binned_quantile_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale path for percentiles over append-only streams/partitions:
    bin counts are pure sums (mergeable across executors and micro-
    batches, like the CMS cells), the histogram is fixed-size whatever
    the data volume, and rank crossings are integer comparisons — no
    float quantile interpolation to disagree about.  Error is bounded by
    the bin width, chosen from the known value domain."""
    from pyspark.sql import Window

    from amazon_kinesis_data_analytics_flinktableapi_spark.functions.scalar import finite_or_null

    (ev,) = load(spark, sf_dir, "events")
    b = ev.filter(F.col("value").isNotNull() & finite_or_null("value")).select(
        "event_type", F.expr("CAST(FLOOR(value * 100) AS BIGINT) div 10").alias("bin")
    )
    hist = b.groupBy("event_type", "bin").agg(F.count(F.lit(1)).alias("c"))
    wcum = Window.partitionBy("event_type").orderBy("bin")
    wall = Window.partitionBy("event_type")
    cum = hist.select(
        "event_type", "bin",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("n"),
    )
    def cross(k: int, q: int):
        return F.min(F.when(F.col("cum") * k >= F.col("n") * q, F.col("bin"))) * 10

    return cum.groupBy("event_type").agg(
        cross(2, 1).cast("bigint").alias("p50_cents"),
        cross(20, 19).cast("bigint").alias("p95_cents"),
        cross(100, 99).cast("bigint").alias("p99_cents"),
    )


@query(
    "chisq_priority_status",
    oracle="""
    WITH cells AS (
      SELECT o_orderpriority AS p, o_orderstatus AS s, count(*) AS o
      FROM orders GROUP BY 1, 2
    ),
    grid AS (
      SELECT p.p, s.s, coalesce(c.o, 0) AS o
      FROM (SELECT DISTINCT p FROM cells) p
      CROSS JOIN (SELECT DISTINCT s FROM cells) s
      LEFT JOIN cells c ON c.p = p.p AND c.s = s.s
    ),
    m AS (
      SELECT g.p, g.s, g.o,
             sum(g.o) OVER (PARTITION BY g.p) AS r,
             sum(g.o) OVER (PARTITION BY g.s) AS c,
             sum(g.o) OVER () AS n
      FROM grid g
    ),
    terms AS (
      SELECT p, s,
             CAST(FLOOR(CAST(o * n - r * c AS DOUBLE) * CAST(o * n - r * c AS DOUBLE)
                        * 1000000.0 / (CAST(r * c AS DOUBLE) * n)) AS BIGINT) AS t
      FROM m
    )
    SELECT CAST(sum(t) AS BIGINT) AS chi2_micro,
           CAST((count(DISTINCT p) - 1) * (count(DISTINCT s) - 1) AS BIGINT) AS dof
    FROM terms
    """,
    doc="chi-square independence test (order priority × status) in "
    "quantized-integer form: per-cell (O·n−r·c)²·10⁶/(r·c·n) floored to "
    "an integer BEFORE summing, so the statistic is summation-order-free "
    "and engine-exact — the categorical-drift detector for corpus "
    "composition monitoring",
)
def q_chisq_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """χ² = Σ (O−E)²/E with E = r·c/n, multiplied through by n² to keep
    the numerator in exact integer products (counts ≤ 15k at sf0.01 ⇒
    every product < 2⁵³), then one correctly-rounded double square,
    multiply, divide — identical op sequence on any IEEE engine — and an
    integer floor per cell.  The grid completes missing (row, col) combos
    so zero cells contribute their expected-count term.  Scale: one
    groupBy on the pair, window marginals over the |rows|×|cols| grid."""
    from pyspark.sql import Window

    (orders,) = load(spark, sf_dir, "orders")
    cells = orders.groupBy(
        F.col("o_orderpriority").alias("p"), F.col("o_orderstatus").alias("s")
    ).agg(F.count(F.lit(1)).alias("o"))
    grid = (
        cells.select("p").distinct()
        .crossJoin(cells.select("s").distinct())
        .join(cells, ["p", "s"], "left")
        .select("p", "s", F.coalesce("o", F.lit(0)).alias("o"))
    )
    m = grid.select(
        "p", "s", "o",
        F.sum("o").over(Window.partitionBy("p")).alias("r"),
        F.sum("o").over(Window.partitionBy("s")).alias("c"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    d = (F.col("o") * F.col("n") - F.col("r") * F.col("c")).cast("double")
    t = F.floor(
        d * d * F.lit(1000000.0) / ((F.col("r") * F.col("c")).cast("double") * F.col("n"))
    ).cast("bigint")
    return m.select("p", "s", t.alias("t")).agg(
        F.sum("t").cast("bigint").alias("chi2_micro"),
        (
            (F.count_distinct(F.col("p")) - 1) * (F.count_distinct(F.col("s")) - 1)
        ).cast("bigint").alias("dof"),
    )


@query(
    "schema_evolution_read",
    oracle="""
    WITH g1 AS (
      SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_channel
      FROM orders
    ),
    g2 AS (
      SELECT o_orderkey, o_totalprice,
             CASE WHEN o_orderpriority LIKE '1%' THEN 'web'
                  WHEN o_orderpriority LIKE '2%' THEN 'store'
                  ELSE 'partner' END AS o_channel
      FROM orders
    ),
    u AS (SELECT * FROM g1 UNION ALL SELECT * FROM g2)
    SELECT o_channel, count(*) AS n_rows,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM u GROUP BY o_channel
    """,
    doc="schema-evolution read path (the ingest reality a long-lived "
    "pipeline faces: columns get ADDED over time, old files lack them): "
    "write generation 1 of the orders table WITHOUT the o_channel "
    "column, append generation 2 WITH it to the SAME directory, then "
    "read the mixed directory through ONE declared current schema "
    "(sources.batch.read_parquet_evolved) — gen-1 rows surface "
    "o_channel as NULL, exactly the contract a backfill job keys on — "
    "and aggregate rows + exact integer revenue cents per channel.  The "
    "oracle reproduces both generations from the raw table, so the "
    "parquet roundtrip AND the NULL-fill semantics are what's attested. "
    " Scale: the declared-schema mode does no footer-discovery pass "
    "(the schema IS the contract) and keeps scan pruning/pushdown; the "
    "mergeSchema discovery mode exists separately and is deliberately "
    "not this path",
)
def q_schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

    from amazon_kinesis_data_analytics_flinktableapi_spark.queries import scratch_dir
    from amazon_kinesis_data_analytics_flinktableapi_spark.sources.batch import (
        read_parquet_evolved,
    )

    (orders,) = load(spark, sf_dir, "orders")
    channel = (
        F.when(F.col("o_orderpriority").startswith("1"), "web")
        .when(F.col("o_orderpriority").startswith("2"), "store")
        .otherwise("partner")
    )
    d = scratch_dir("schema_evo_") + "/orders"
    # generation 1: before o_channel existed
    orders.select("o_orderkey", "o_totalprice").write.mode("overwrite").parquet(d)
    # generation 2: the column added — APPENDED into the same directory
    orders.select(
        "o_orderkey", "o_totalprice", channel.alias("o_channel")
    ).write.mode("append").parquet(d)
    current = StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("o_totalprice", DoubleType()),
            StructField("o_channel", StringType()),
        ]
    )
    mixed = read_parquet_evolved(spark, d, schema=current)
    return mixed.groupBy("o_channel").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")).alias(
            "revenue_cents"
        ),
    )

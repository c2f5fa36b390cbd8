"""Advanced surface: statistical aggregates, JSON functions, subqueries,
pivot, Pandas UDAF / grouped-map UDF (the UDAF/UDTF gap in SURVEY.md §2's
coverage checklist), and an oracle-checked *streaming* query.

The pandas queries are the vectorized-Python template path: Arrow batches,
grouped by key, with an exact SQL oracle — proving the UDF results, not
just running them.
"""

from __future__ import annotations

import tempfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amazon_kinesis_data_analytics_flinktableapi_spark.queries import load, query, scratch_dir


def _streaming_orders_rates(ev):
    """Shared orders/rates role projection of events for the streaming
    interval-join and as-of surfaces — ONE definition (same rationale as
    extras._asof_orders_rates: the % 17 rate filter and % 97 + 2 rate
    formula must not drift per-query; each oracle mirrors this).
    Non-finite value rows are swallowed before the int bindings
    (functions.scalar.finite_or_null — the reference's malformed-record
    policy; r14 audit: one ±inf row CAST-aborted the whole streaming
    job); a scan-local stateless filter, so append semantics and
    watermarks are untouched."""
    from amazon_kinesis_data_analytics_flinktableapi_spark.functions.scalar import finite_or_null

    ev = ev.filter(finite_or_null("value"))
    orders_b = ev.select(
        F.col("event_id").cast("int").alias("id"),
        F.col("ts").alias("orderTime"),
        F.floor(F.col("value") * 100).cast("int").alias("amount"),
        F.col("event_type").alias("currency"),
    )
    rates_b = ev.filter(F.col("event_id") % 17 == 0).select(
        F.col("ts").alias("exchangeRateTime"),
        F.col("event_type").alias("currency"),
        (F.floor(F.col("value")).cast("int") % 97 + 2).alias("rate"),
    )
    return orders_b, rates_b


@query(
    "stat_aggregates",
    oracle="""
    SELECT event_type,
           floor(stddev_samp(value) * 1000000 + 0.5) / 1000000 AS value_stddev,
           floor(var_samp(value) * 1000000 + 0.5) / 1000000 AS value_var,
           floor(corr(value, user_id) * 1000000 + 0.5) / 1000000 AS value_user_corr,
           floor(quantile_cont(value, 0.5) * 1000000 + 0.5) / 1000000 AS value_median,
           min(value) AS value_min,
           max(value) AS value_max
    FROM events
    WHERE (value IS NULL OR isfinite(value))
    GROUP BY event_type
    """,
    doc="statistical aggregates: stddev/variance/correlation/exact median",
)
def q_stat_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    def r6(c):
        return F.floor(c * 1_000_000 + 0.5) / 1_000_000

    # non-finite swallow (r14 audit: one ±inf row made DuckDB's
    # STDDEV_SAMP range-error and Spark return NaN — one bad record must
    # degrade, not poison every moment of its group)
    from amazon_kinesis_data_analytics_flinktableapi_spark.functions.scalar import finite_or_null

    (ev,) = load(spark, sf_dir, "events")
    ev = ev.filter(finite_or_null("value"))
    return ev.groupBy("event_type").agg(
        r6(F.stddev_samp("value")).alias("value_stddev"),
        r6(F.var_samp("value")).alias("value_var"),
        r6(F.corr("value", "user_id")).alias("value_user_corr"),
        r6(F.percentile("value", F.lit(0.5))).alias("value_median"),
        F.min("value").alias("value_min"),
        F.max("value").alias("value_max"),
    )


#: exact_median_select histogram width per refinement level
_MEDIAN_B = 1024


@query(
    "exact_median_select",
    oracle="""
    WITH v AS (SELECT event_id, value FROM events
               WHERE value IS NOT NULL AND isfinite(value)),
    kk AS (SELECT CAST(ceil(count(*) / 2.0) AS BIGINT) AS k FROM v),
    r AS (SELECT event_id, value,
                 row_number() OVER (ORDER BY value, event_id) AS rn FROM v)
    SELECT r.event_id, r.value AS median_value, r.rn AS k
    FROM r, kk WHERE r.rn = kk.k
    """,
    doc="exact global median (lower median, k = ceil(n/2)-th order "
    "statistic) via two-level histogram selection — no global sort, no "
    "single-node value buffer; the oracle is the brute-force global "
    "row_number formulation the algorithm must equal",
)
def q_exact_median_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed selection (BFPRT-style bucket narrowing): the exact
    k-th order statistic without ever sorting the dataset globally or
    buffering values on one node — the 100 TB answer to what
    ``stat_aggregates``' ``F.percentile`` does with a single in-memory
    value buffer per group.

    Two scan passes narrow k through a 1024-bucket histogram each
    (driver receives 1-row min/max/count and two ≤1024-row histograms —
    all bounded): after level 1 the candidate set is ~n/2^10, after
    level 2 ~n/2^20, so the final (value, event_id) ranking sorts ≤ ~10^6
    rows even at 10^12 input rows — a bounded single-partition tail
    (whitelisted as such in the plan sweep).  Production would loop the
    same refinement to depth ceil(log_B n); two unrolled levels cover
    every realistic table and keep the plan static.  Level-2 buckets are
    a finer global grid (B² cells) restricted to the level-1 winner, so
    float-boundary drift between levels cannot misplace a row: the
    cumulative count is recomputed from the SAME bucket values that
    partition the rows.  Non-finite values are excluded on both engines
    (ADVICE r13): NaN because floor(NaN-derived) buckets would silently
    drop rows (both engines sort NaN above +inf, so ranking them would
    "work" but bucketing can't), ±inf because hi−lo becomes inf and
    (value−lo)/(hi−lo) degenerates to NaN/0 bucket ids — rows would be
    misplaced or dropped while a SQL oracle ranks infinities normally.
    Ties break on event_id — fully deterministic output:
    (event_id, median_value, k)."""
    from pyspark.sql.window import Window

    (ev,) = load(spark, sf_dir, "events")
    v = ev.filter(
        F.col("value").isNotNull()
        & ~F.isnan("value")
        & (F.abs(F.col("value")) != F.lit(float("inf")))
    ).select("event_id", "value")
    stats = v.agg(
        F.count(F.lit(1)).alias("n"), F.min("value").alias("lo"), F.max("value").alias("hi")
    ).collect()[0]
    n = stats["n"]
    spark_sess = ev.sparkSession
    if n == 0:
        return spark_sess.createDataFrame([], "event_id long, median_value double, k bigint")
    lo, hi = float(stats["lo"]), float(stats["hi"])
    k = (n + 1) // 2  # ceil(n/2): the lower median

    def bucket(width: int):
        if hi == lo:
            return F.lit(0)
        return F.least(
            F.floor((F.col("value") - lo) / (hi - lo) * width), F.lit(width - 1)
        ).cast("long")

    def narrow(df: DataFrame, width: int, k_local: int) -> tuple[DataFrame, int]:
        hist = (
            df.select(bucket(width).alias("b"))
            .groupBy("b").agg(F.count(F.lit(1)).alias("c"))
            .orderBy("b").collect()  # bounded: ≤ min(width, distinct buckets) rows
        )
        cum = 0
        for row in hist:
            if cum + row["c"] >= k_local:
                return df.filter(bucket(width) == row["b"]), k_local - cum
            cum += row["c"]
        raise AssertionError("k exceeded histogram total — concurrent input mutation")

    lvl1, k1 = narrow(v, _MEDIAN_B, k)
    lvl2, k2 = narrow(lvl1, _MEDIAN_B * _MEDIAN_B, k1)
    w = Window.orderBy("value", "event_id")
    return (
        lvl2.select("event_id", "value", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == k2)
        .select("event_id", F.col("value").alias("median_value"), F.lit(k).cast("long").alias("k"))
    )


@query(
    "grouped_median_select",
    oracle="""
    WITH v AS (SELECT event_type, event_id, value FROM events
               WHERE value IS NOT NULL AND isfinite(value)),
    n AS (SELECT event_type, count(*) AS n FROM v GROUP BY event_type),
    r AS (SELECT event_type, event_id, value,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY value, event_id) AS rn FROM v)
    SELECT r.event_type, r.event_id, r.value AS median_value,
           GREATEST(1, CAST(ceil(n.n * 0.5) AS BIGINT)) AS k
    FROM r JOIN n USING (event_type)
    WHERE r.rn = GREATEST(1, CAST(ceil(n.n * 0.5) AS BIGINT))
    """,
    doc="exact PER-GROUP median (lower median, k = ceil(n_g/2)-th order "
    "statistic per event_type) via fully distributed two-level histogram "
    "selection — zero driver collects, no per-group value buffer; the "
    "oracle is the brute-force per-group row_number formulation",
)
def q_grouped_median_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VERDICT r13 #5: ``exact_median_select``'s histogram refinement
    generalized to per-group k-th statistics, replacing the one
    scale-wrong primitive left on a driver-query path —
    ``F.percentile``'s per-group in-memory value buffer (fine when
    groups are few, wrong at a high-cardinality group key).  Unlike the
    global variant this one collects NOTHING: per-group (n, lo, hi, k)
    ride an equi join, winning buckets come from a window partitioned
    by group, and survivors shrink ~B× per level before a per-group
    row_number ranks the ≤ n_g/B² tail.  See
    operators/ranking.grouped_kth_select for the full plan-shape
    argument.  Output: (event_type, event_id, median_value, k)."""
    from amazon_kinesis_data_analytics_flinktableapi_spark.operators.ranking import (
        grouped_kth_select,
    )

    (ev,) = load(spark, sf_dir, "events")
    return grouped_kth_select(
        ev, ["event_type"], value_col="value", id_col="event_id", p=0.5
    ).select(
        "event_type",
        "event_id",
        F.col("value").alias("median_value"),
        "k",
    )


@query(
    "grouped_percentiles_select",
    oracle="""
    WITH v AS (SELECT event_type, event_id, value FROM events
               WHERE value IS NOT NULL AND isfinite(value)),
    n AS (SELECT event_type, count(*) AS n FROM v GROUP BY event_type),
    r AS (SELECT event_type, event_id, value,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY value, event_id) AS rn FROM v),
    ks AS (SELECT event_type, p, GREATEST(1, CAST(ceil(n * p) AS BIGINT)) AS k
           FROM n, (SELECT CAST(unnest([0.25, 0.75]) AS DOUBLE) AS p))
    SELECT r.event_type, ks.p, r.event_id, r.value AS pct_value, ks.k
    FROM r JOIN ks ON r.event_type = ks.event_type AND r.rn = ks.k
    """,
    doc="exact per-group p25/p75 (k = ceil(p*n_g)-th order statistics) via "
    "the same distributed histogram selection as grouped_median_select — "
    "one operator invocation per percentile, no per-group value buffer",
)
def q_grouped_percentiles_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The generality half of VERDICT r13 #5: exact LOWER percentiles —
    the k-th actual data value, not an interpolation, so the result
    hash-matches a row_number oracle.  FUSED: both percentiles narrow
    through ONE shared level-1 histogram
    (``grouped_kth_select_multi``) — the fact table is scanned the same
    number of times as for a single percentile; only the ~n_g/B
    level-2 survivors fan out per p.  Output:
    (event_type, p, event_id, pct_value, k)."""
    from amazon_kinesis_data_analytics_flinktableapi_spark.operators.ranking import (
        grouped_kth_select_multi,
    )

    (ev,) = load(spark, sf_dir, "events")
    return grouped_kth_select_multi(
        ev, ["event_type"], value_col="value", id_col="event_id", ps=[0.25, 0.75]
    ).select(
        "event_type", "p", "event_id", F.col("value").alias("pct_value"), "k"
    )


@query(
    "robust_mad_select",
    oracle="""
    WITH v AS (SELECT event_type, event_id, value FROM events
               WHERE value IS NOT NULL AND isfinite(value)),
    n AS (SELECT event_type, count(*) AS n FROM v GROUP BY event_type),
    r AS (SELECT event_type, event_id, value,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY value, event_id) AS rn FROM v),
    med AS (SELECT r.event_type, r.value AS med
            FROM r JOIN n USING (event_type)
            WHERE r.rn = GREATEST(1, CAST(ceil(n.n * 0.5) AS BIGINT))),
    d AS (SELECT v.event_type, v.event_id, med.med,
                 abs(v.value - med.med) AS dev
          FROM v JOIN med USING (event_type)),
    r2 AS (SELECT event_type, med, dev,
                  row_number() OVER (PARTITION BY event_type
                                     ORDER BY dev, event_id) AS rn FROM d)
    SELECT r2.event_type, r2.med AS median_value, r2.dev AS mad_value,
           n.n AS n_events
    FROM r2 JOIN n USING (event_type)
    WHERE r2.rn = GREATEST(1, CAST(ceil(n.n * 0.5) AS BIGINT))
    """,
    doc="median absolute deviation per group computed ENTIRELY by "
    "distributed selection (two grouped_kth_select passes, lower-median "
    "semantics) — the scale path for robust_stats_mad, whose "
    "F.percentile buffers each group's values in one task",
)
def q_robust_mad_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust dispersion at a high-cardinality group key: pass 1 selects
    each group's exact lower median (no value buffer), the tiny
    per-group median table broadcasts back onto the fact scan, pass 2
    selects the lower median of |x − med| the same way.  Every value in
    the output is an actual data value or an exact IEEE |a−b| of two —
    no interpolation, no rounding, hash-exact against the row_number
    oracle.  ``robust_stats_mad`` (interpolated percentile semantics)
    stays for parity with quantile_cont; THIS shape is the one that
    survives 10^6 groups × 10^6 values.  Output: (event_type,
    median_value, mad_value, n_events)."""
    from amazon_kinesis_data_analytics_flinktableapi_spark.operators.ranking import (
        grouped_kth_select,
    )

    (ev,) = load(spark, sf_dir, "events")
    inf = float("inf")
    v = ev.filter(
        F.col("value").isNotNull()
        & ~F.isnan("value")
        & (F.abs(F.col("value")) != F.lit(inf))
    ).select("event_type", "event_id", "value")
    n = v.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_events"))
    med = (
        grouped_kth_select(
            v, ["event_type"], value_col="value", id_col="event_id", p=0.5
        )
        .select("event_type", F.col("value").alias("med"))
        # Materialize pass 1's selected frame (ONE row per group — bounded
        # at any corpus size, same class as the band-sweep summary): it is
        # referenced once here and once in the final join, and pass 2's
        # selection operator re-reads its input ~4x internally — without
        # the cut, pass 1's whole multi-shuffle histogram pipeline
        # re-executes inside every one of those branches (r17 "not yet
        # optimized" item; measured 5.0 s -> see OPTIMIZATION_r17.md).
        .localCheckpoint()
    )
    dev = v.join(F.broadcast(med), "event_type").select(
        "event_type", "event_id", (F.abs(F.col("value") - F.col("med"))).alias("dev")
    )
    mad = grouped_kth_select(
        dev, ["event_type"], value_col="dev", id_col="event_id", p=0.5
    ).select("event_type", F.col("dev").alias("mad_value"))
    return (
        med.select("event_type", F.col("med").alias("median_value"))
        # broadcast BOTH group-bounded sides (mad: one row per group, same
        # class as the already-hinted n): the checkpointed med side is a
        # LogicalRDD whose size the planner cannot estimate, so without
        # the hint this 5-rows-a-side join planned as the query's only
        # SortMergeJoin (r17 after-plan line 12; ADVICE r17 #1 /
        # VERDICT r17 item 5) — two sorts + a shuffle for |groups| rows
        .join(F.broadcast(mad), "event_type")
        .join(F.broadcast(n), "event_type")
        .select("event_type", "median_value", "mad_value", "n_events")
    )


@query(
    "json_extract_agg",
    oracle="""
    SELECT event_type,
           CAST(sum(TRY_CAST(json_extract_string(
             CASE WHEN json_valid(props) THEN props END, '$.k') AS INTEGER))
             AS BIGINT) AS k_sum,
           count(*) AS n
    FROM events
    GROUP BY event_type
    """,
    doc="JSON path extraction from the props column + aggregation",
)
def q_json_extract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # malformed/empty props and non-numeric k are NULL on BOTH engines:
    # Spark's get_json_object already NULLs malformed JSON, but DuckDB's
    # json_extract_string ERRORS on it (json_valid gate), and a bare ANSI
    # cast of a non-numeric extract would abort Spark (try_cast) — the
    # adversarial fixture's empty-string props crashed the oracle
    (ev,) = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.sum(F.expr("try_cast(get_json_object(props, '$.k') AS int)")).alias("k_sum"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "correlated_subquery",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE o_totalprice > (
      SELECT 2 * avg(o_totalprice) FROM orders i WHERE i.o_custkey = o.o_custkey
    )
    """,
    doc="correlated scalar subquery (decorrelated by Catalyst into an agg+join)",
)
def q_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spark-side: expressed through the SQL entry point — Catalyst's
    # subquery decorrelation turns it into aggregate + join, the same
    # rewrite DuckDB applies.  At scale this is one shuffle on o_custkey.
    load(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders o
        WHERE o_totalprice > (
          SELECT 2 * avg(o_totalprice) FROM orders i WHERE i.o_custkey = o.o_custkey
        )
        """
    )


@query(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS status_f,
           CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS status_o,
           CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS status_p
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="pivot: order counts per priority × status (explicit value list)",
)
def q_pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DataFrame pivot with an explicit value list — no extra pass to
    # discover pivot values, which is the scalable form.
    (orders,) = load(spark, sf_dir, "orders")
    out = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("status_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("status_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("status_p"),
    )


@query(
    "pandas_grouped_zscore",
    oracle="""
    SELECT event_id, user_id,
           floor((value - avg(value) OVER w) / stddev_samp(value) OVER w * 10000 + 0.5) / 10000
             AS zscore
    FROM events
    WHERE (value IS NULL OR isfinite(value))
    WINDOW w AS (PARTITION BY user_id)
    """,
    doc="grouped-map Pandas UDF (applyInPandas): per-user z-score, SQL-oracle-proven",
)
def q_pandas_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from amazon_kinesis_data_analytics_flinktableapi_spark.functions.scalar import finite_or_null

    (ev,) = load(spark, sf_dir, "events")
    ev = ev.filter(finite_or_null("value"))  # non-finite swallow (r14 audit)

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf["value"].std(ddof=1)
        z = (pdf["value"] - pdf["value"].mean()) / std
        import numpy as np

        out = np.floor(z * 10000 + 0.5) / 10000
        # degenerate groups (one event, or zero variance) give NaN here
        # but NULL from the oracle's stddev_samp/division — emit None so
        # the hash compare agrees ('nan' != 'None' after stringification)
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "user_id": pdf["user_id"],
                "zscore": out.where(~out.isna(), None).astype(object),
            }
        )

    return (
        ev.select("event_id", "user_id", "value")
        .groupBy("user_id")
        .applyInPandas(zscore, "event_id long, user_id long, zscore double")
    )


@query(
    "pandas_udaf_weighted_avg",
    oracle="""
    SELECT event_type,
           -- a NULL measurement contributes NEITHER numerator NOR weight:
           -- sum() skips the NULL product on its own, but the raw
           -- sum(user_id) would still count the row's weight and silently
           -- deflate the mean
           floor(sum(CAST(FLOOR(value * 100) AS BIGINT) * user_id) / 100.0
                 / sum(CASE WHEN value IS NOT NULL THEN user_id END)
                 * 10000 + 0.5) / 10000 AS weighted_avg
    FROM events
    WHERE user_id > 0 AND (value IS NULL OR isfinite(value))
    GROUP BY event_type
    """,
    doc="grouped-agg Pandas UDF (UDAF): user-weighted mean value per event type",
)
def q_pandas_udaf_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    @F.pandas_udf("double")
    def weighted_avg(v: pd.Series, w: pd.Series) -> float:
        # integer cents x integer weights: the numerator is an EXACT int64
        # sum, so neither the Arrow batch order here nor the oracle's own
        # sum order can move the result (a double fold is order-dependent).
        # NULL measurements drop out entirely (value AND weight): an
        # unmasked np.floor(NaN).astype(int64) is undefined garbage
        # (observed −9.2e18) that poisons the whole group's sum
        mask = v.notna().to_numpy()
        if not mask.any():
            return None
        cents = np.floor(v.to_numpy()[mask] * 100).astype(np.int64)
        wm = w.to_numpy()[mask].astype(np.int64)
        num = int((cents * wm).sum())
        return float(np.floor(num / 100.0 / float(wm.sum()) * 10000 + 0.5) / 10000)

    from amazon_kinesis_data_analytics_flinktableapi_spark.functions.scalar import finite_or_null

    (ev,) = load(spark, sf_dir, "events")
    return (
        # non-finite swallow (r14 audit): floor(±inf*100).astype(int64)
        # inside the UDAF is the same undefined-garbage hazard as NaN
        ev.filter((F.col("user_id") > 0) & finite_or_null("value"))
        .groupBy("event_type")
        .agg(weighted_avg("value", "user_id").alias("weighted_avg"))
    )


@query(
    "python_udtf_bigrams",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text, ' '), '[ \t\n\x0b\f\r]+'), t -> t <> '') AS tk
      FROM documents WHERE doc_id < 50
    )
    SELECT doc_id,
           unnest(list_slice(tk, 1, len(tk) - 1)) AS w1,
           unnest(list_slice(tk, 2, len(tk))) AS w2
    FROM toks WHERE len(tk) >= 2
    """,
    doc="Python UDTF (table function): 1-to-N bigram expansion, oracle-proven",
)
def q_python_udtf_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A real Python UDTF (Spark 4 table function) — the UDTF slot of the
    # UDF/UDAF/UDTF triad.  Row-at-a-time Python is the slow path (the
    # built-in explode form of this op is elsewhere); capped to 50 docs so
    # the demo stays cheap while the API surface is genuinely exercised.
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="doc_id bigint, w1 string, w2 string")
    class Bigrams:
        def eval(self, doc_id: int, text: str):
            toks = [t for t in (text or "").split() if t]
            for a, b in zip(toks, toks[1:]):
                yield doc_id, a, b

    spark.udtf.register("bigrams", Bigrams)
    load(spark, sf_dir, "documents")
    return spark.sql(
        """
        SELECT b.doc_id, b.w1, b.w2
        FROM documents d, LATERAL bigrams(d.doc_id, d.text) b
        WHERE d.doc_id < 50
        """
    )


@query(
    "range_frame_window",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderdate,
           count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                          RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)
             AS orders_trailing_30d
    FROM orders
    """,
    doc="RANGE-frame window: trailing 30-day order count per customer",
)
def q_range_frame_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_orderdate,
               count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                              RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)
                 AS orders_trailing_30d
        FROM orders
        """
    )


@query(
    "streaming_tumbling_window",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n_events,
           sum(CAST(FLOOR(value * 100) AS BIGINT)) / 100.0 AS total_value
    FROM events
    WHERE (value IS NULL OR isfinite(value))
    GROUP BY 1, 2
    -- cutoff over the FILTERED set: swallowed rows never advance the
    -- stream's event-time clock (the filter sits before the watermark)
    HAVING date_trunc('hour', ts) + INTERVAL 1 HOUR
           <= (SELECT max(ts) FROM events WHERE (value IS NULL OR isfinite(value)))
    """,
    doc="STREAMING tumbling window via file replay; append mode emits exactly "
    "the windows the terminal watermark closes (end <= max event time) — oracle-proven",
)
def q_streaming_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from amazon_kinesis_data_analytics_flinktableapi_spark.schemas import EVENTS_SCHEMA
    from amazon_kinesis_data_analytics_flinktableapi_spark.streaming.replay import (
        replay_stream,
        run_to_memory,
    )

    from amazon_kinesis_data_analytics_flinktableapi_spark.functions.scalar import finite_or_null

    (ev,) = load(spark, sf_dir, "events")
    tmp = scratch_dir("stream_tw_")
    stream = replay_stream(spark, ev, EVENTS_SCHEMA, tmp)
    # non-finite swallow BEFORE the int binding (stateless; r14 audit)
    stream = stream.filter(finite_or_null("value"))
    agg = (
        stream.withWatermark("ts", "0 seconds")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), (F.sum(F.floor(F.col("value") * 100)) / F.lit(100.0)).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )
    return run_to_memory(agg, spark, timeout_sec=240)


@query(
    "streaming_session_window",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 6 HOUR
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      -- ts IS NOT NULL: the streaming side's watermark drops rows with a
      -- NULL event time before session assembly
      FROM events WHERE ts IS NOT NULL
    ), sessions AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id, min(ts) AS session_start, max(ts) AS session_last,
           count(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    HAVING max(ts) + INTERVAL 6 HOUR <= (SELECT max(ts) FROM events)
    """,
    doc="STREAMING session windows (6h gap) via file replay; append mode "
    "emits exactly the sessions the terminal watermark closes "
    "(last event + gap <= max event time) — oracle = gaps-and-islands",
)
def q_streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from amazon_kinesis_data_analytics_flinktableapi_spark.schemas import EVENTS_SCHEMA
    from amazon_kinesis_data_analytics_flinktableapi_spark.streaming.replay import (
        replay_stream,
        run_to_memory,
    )
    from amazon_kinesis_data_analytics_flinktableapi_spark.streaming.windows import session_agg

    (ev,) = load(spark, sf_dir, "events")
    tmp = scratch_dir("stream_sw_")
    stream = replay_stream(spark, ev, EVENTS_SCHEMA, tmp)
    agg = session_agg(
        stream, "ts", "6 hours", ["user_id"], [F.count(F.lit(1)).alias("n_events")]
    )
    # session_window end = last event + gap; report the last event itself so
    # the oracle's gaps-and-islands max(ts) compares directly
    out = agg.select(
        "user_id",
        "session_start",
        (F.col("session_end") - F.expr("INTERVAL 6 HOURS")).alias("session_last"),
        "n_events",
    )
    return run_to_memory(out, spark, timeout_sec=240)


@query(
    "streaming_running_aggregate",
    oracle="""
    SELECT event_type AS key, count(*) AS n,
           list_reduce(list(value ORDER BY ts, value), (a, v) -> a + v) AS total,
           list_reduce(list(value ORDER BY ts, value), (a, v) -> 0.3 * v + (1 - 0.3) * a) AS ema
    -- ts/value IS NOT NULL: the running fold's caller contract (see
    -- streaming.windows.running_aggregate) — an unknown event time has no
    -- position in an order-sensitive fold, and a NULL measurement would
    -- NaN the state
    FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    GROUP BY event_type
    """,
    doc="STREAMING custom stateful operator (applyInPandasWithState): "
    "per-key running count/sum/EMA in update mode; final state per key "
    "oracle-matches a DuckDB ordered-list fold (identical sequential fp ops)",
)
def q_streaming_running_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from amazon_kinesis_data_analytics_flinktableapi_spark.schemas import EVENTS_SCHEMA
    from amazon_kinesis_data_analytics_flinktableapi_spark.streaming.replay import (
        replay_stream,
        run_to_memory,
    )
    from amazon_kinesis_data_analytics_flinktableapi_spark.streaming.windows import (
        running_aggregate,
    )

    (ev,) = load(spark, sf_dir, "events")
    # running_aggregate's caller contract: no NULL event times or values
    ev = ev.filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
    tmp = scratch_dir("stream_ra_")
    # 3 ts-ordered chunks → ≥2 micro-batches → state genuinely carries
    # across batches (the thing this operator exists for)
    stream = replay_stream(
        spark, ev, EVENTS_SCHEMA, tmp, n_chunks=3, order_col="ts", max_files_per_trigger=1
    )
    updates = running_aggregate(stream, "event_type", "ts", "value")
    collected = run_to_memory(updates, spark, timeout_sec=240, output_mode="update")
    # update mode emits one row per key per batch; the FINAL state per key
    # (max n — n is strictly increasing) is the oracle-comparable answer
    w = Window.partitionBy("key").orderBy(F.col("n").desc())
    return (
        collected.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("key", "n", "total", "ema")
    )


@query(
    "streaming_static_enrich",
    oracle="""
    WITH dim(event_type, type_weight) AS (
      VALUES ('click', 1), ('view', 2), ('signup', 5), ('purchase', 10), ('error', 0)
    )
    SELECT e.event_id, e.user_id, e.event_type, d.type_weight,
           -- half-up floor, not round(): value*weight lands on exact .xx5
           -- ties where Spark's HALF_UP and DuckDB's rounding split (the
           -- skew fixture hit one at 359.285) — functions.text.half_up_round
           -- convention
           floor(e.value * d.type_weight * 100 + 0.5) / 100 AS weighted_value
    FROM events e JOIN dim d ON e.event_type = d.event_type
    WHERE (e.value IS NULL OR isfinite(e.value))
    """,
    doc="STREAMING stream-static broadcast join: replayed event stream "
    "enriched against an in-memory dimension table (stateless, no "
    "watermark needed) — every micro-batch joins the same static side",
)
def q_streaming_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from amazon_kinesis_data_analytics_flinktableapi_spark.schemas import EVENTS_SCHEMA
    from amazon_kinesis_data_analytics_flinktableapi_spark.streaming.replay import (
        replay_stream,
        run_to_memory,
    )

    (ev,) = load(spark, sf_dir, "events")
    dim = spark.createDataFrame(
        [("click", 1), ("view", 2), ("signup", 5), ("purchase", 10), ("error", 0)],
        "event_type string, type_weight int",
    )
    tmp = scratch_dir("stream_se_")
    stream = replay_stream(spark, ev, EVENTS_SCHEMA, tmp)
    # stream-static joins are stateless: the static side is planned as a
    # broadcast into every micro-batch; inner join keeps append semantics.
    # Non-finite value rows are swallowed scan-side (stateless filter, the
    # reference's malformed-record policy — r14 audit: ±inf silently
    # saturated through the BIGINT floor() to ±2⁶³−1 here).
    from amazon_kinesis_data_analytics_flinktableapi_spark.functions.scalar import finite_or_null

    stream = stream.filter(finite_or_null("value"))
    out = stream.join(F.broadcast(dim), "event_type").select(
        "event_id",
        "user_id",
        "event_type",
        "type_weight",
        # half-up floor — see the oracle comment
        (F.floor(F.col("value") * F.col("type_weight") * 100 + 0.5) / 100).alias("weighted_value"),
    )
    return run_to_memory(out, spark, timeout_sec=240)


@query(
    "streaming_interval_join",
    oracle=f"""
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
    )
    SELECT o.id, o.amount, o.currency, r.rate,
           o.amount * r.rate AS converted_amount
    FROM o JOIN r
      ON o.currency = r.currency
     AND o.order_time >= r.rate_time
     AND r.rate_time > o.order_time - INTERVAL 1 HOUR
    """,
    doc="STREAMING stream-stream interval join via file replay; matched rows "
    "(≡ inner join) are exactly the batch answer — the dynamic-table contract, oracle-proven",
)
def q_streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A genuine Structured Streaming execution inside the correctness gate:
    # replay events as JSON file streams, run the watermarked stream-stream
    # join, collect the append output.  Matched rows must equal the batch
    # inner join bit-for-bit (outer NULLs are excluded: their emission
    # depends on terminal-watermark timing — SURVEY.md §7).
    from amazon_kinesis_data_analytics_flinktableapi_spark.streaming.replay import run_to_memory

    joined = prepare_streaming_interval_join(spark, sf_dir)
    return run_to_memory(joined, spark, timeout_sec=240)


def prepare_streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the replay fixture (driver-side JSON dump — test harness, not
    engine work) and return the UNSTARTED streaming join.  bench.py times
    only the streaming execution of the returned plan, so the reported
    rec/s measures the join pipeline rather than fixture generation."""
    from amazon_kinesis_data_analytics_flinktableapi_spark.schemas import (
        EXCHANGE_RATE_SCHEMA,
        ORDER_SCHEMA,
    )
    from amazon_kinesis_data_analytics_flinktableapi_spark.streaming.replay import replay_stream

    (ev,) = load(spark, sf_dir, "events")
    orders_b, rates_b = _streaming_orders_rates(ev)
    tmp = scratch_dir("stream_ij_")
    orders_s = replay_stream(spark, orders_b, ORDER_SCHEMA, f"{tmp}/orders")
    rates_s = replay_stream(spark, rates_b, EXCHANGE_RATE_SCHEMA, f"{tmp}/rates")

    from amazon_kinesis_data_analytics_flinktableapi_spark.operators.interval_join import (
        interval_join_bucketed,
    )

    o = orders_s.withColumnRenamed("orderTime", "eventtime").withWatermark("eventtime", "0 seconds")
    r = rates_s.withColumnRenamed("exchangeRateTime", "eventtime").withWatermark("eventtime", "0 seconds")
    # the BUCKETED plan matters even more in streaming than in batch: the
    # stream-stream join partitions its STATE STORE on the equi key, so a
    # bare currency key puts all state in ≤5 of 32 partitions (measured
    # 3.9× slower).  (currency, hour-bucket) spreads state across the
    # cluster; the range residual still drives watermark state eviction.
    joined = interval_join_bucketed(
        o, r, on="currency", left_time="eventtime", right_time="eventtime",
        interval="1 hour", how="inner", direction="backward",
    ).select(
        F.col("l.id").alias("id"),
        F.col("l.amount").alias("amount"),
        F.col("l.currency").alias("currency"),
        F.col("r.rate").alias("rate"),
        (F.col("l.amount") * F.col("r.rate")).alias("converted_amount"),
    )
    return joined


@query(
    "streaming_sliding_window",
    oracle="""
    WITH fe AS (
      SELECT ts, event_type, value FROM events
      WHERE (value IS NULL OR isfinite(value))
    ), starts AS (
      SELECT date_trunc('hour', ts) AS ws, event_type, value FROM fe
      UNION ALL
      SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR, event_type, value FROM fe
    )
    SELECT ws AS window_start, event_type,
           count(*) AS n_events,
           sum(CAST(FLOOR(value * 100) AS BIGINT)) / 100.0 AS total_value
    FROM starts
    GROUP BY 1, 2
    HAVING ws + INTERVAL 2 HOUR <= (SELECT max(ts) FROM fe)
    """,
    doc="STREAMING sliding windows (2h window, 1h slide) via file replay; "
    "append mode emits exactly the windows the terminal watermark closes "
    "(end <= max event time) — oracle = the 2-way union cover enumeration",
)
def q_streaming_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from amazon_kinesis_data_analytics_flinktableapi_spark.schemas import EVENTS_SCHEMA
    from amazon_kinesis_data_analytics_flinktableapi_spark.streaming.replay import (
        replay_stream,
        run_to_memory,
    )
    from amazon_kinesis_data_analytics_flinktableapi_spark.streaming.windows import sliding_agg

    from amazon_kinesis_data_analytics_flinktableapi_spark.functions.scalar import finite_or_null

    (ev,) = load(spark, sf_dir, "events")
    tmp = scratch_dir("stream_slw_")
    stream = replay_stream(spark, ev, EVENTS_SCHEMA, tmp)
    # non-finite swallow BEFORE the watermark: the filtered rows never
    # advance the event-time clock, so the oracle's terminal cutoff is
    # max(ts) over the FILTERED set (the fe CTE)
    stream = stream.filter(finite_or_null("value"))
    agg = sliding_agg(
        stream, "ts", "2 hours", "1 hour", ["event_type"],
        [F.count(F.lit(1)).alias("n_events"), (F.sum(F.floor(F.col("value") * 100)) / F.lit(100.0)).alias("total_value")],
    )
    return run_to_memory(agg, spark, timeout_sec=240).select(
        "window_start", "event_type", "n_events", "total_value"
    )


@query(
    "streaming_dedup_restamped",
    oracle="""
    SELECT event_id, user_id, event_type, value FROM events
    """,
    doc="STREAMING dedup via dropDuplicatesWithinWatermark: every event "
    "replayed twice with the duplicate RE-STAMPED +3s (producer-retry "
    "semantics — same key, different event time, so plain dropDuplicates "
    "state on (key, ts) would NOT collapse it); within-watermark state "
    "keys on event_id alone and evicts at first-sighting + delay — "
    "output == the original distinct rows",
)
def q_streaming_dedup_restamped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from amazon_kinesis_data_analytics_flinktableapi_spark.schemas import EVENTS_SCHEMA
    from amazon_kinesis_data_analytics_flinktableapi_spark.streaming.replay import (
        replay_stream,
        run_to_memory,
    )
    from amazon_kinesis_data_analytics_flinktableapi_spark.streaming.windows import stream_dedup

    (ev,) = load(spark, sf_dir, "events")
    cols = ["event_id", "user_id", "event_type", "value", "ts"]
    restamped = ev.select(*cols).union(
        ev.select(
            "event_id", "user_id", "event_type", "value",
            (F.col("ts") + F.expr("INTERVAL 3 SECONDS")).alias("ts"),
        )
    )
    tmp = scratch_dir("stream_ddw_")
    # the +3s re-stamp sorts the retry AFTER its original, possibly into a
    # later micro-batch — the within-watermark state must bridge batches.
    # Output projects ts AWAY, so whichever copy arrives first inside a
    # batch yields the identical output row (determinism by construction).
    stream = replay_stream(
        spark, restamped, EVENTS_SCHEMA, tmp, n_chunks=3, order_col="ts", max_files_per_trigger=1
    )
    out = stream_dedup(stream, "ts", ["event_id"], watermark="10 seconds", within_watermark=True)
    return run_to_memory(out, spark, timeout_sec=240).select(
        "event_id", "user_id", "event_type", "value"
    )


@query(
    "streaming_dedup",
    oracle="""
    SELECT event_id, user_id, event_type, value FROM events
    """,
    doc="STREAMING exact dedup: events replayed with every row duplicated "
    "across 3 ts-ordered micro-batches; dropDuplicates state carries across "
    "batches, output == the original distinct rows — oracle = plain events",
)
def q_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from amazon_kinesis_data_analytics_flinktableapi_spark.schemas import EVENTS_SCHEMA
    from amazon_kinesis_data_analytics_flinktableapi_spark.streaming.replay import (
        replay_stream,
        run_to_memory,
    )
    from amazon_kinesis_data_analytics_flinktableapi_spark.streaming.windows import stream_dedup

    (ev,) = load(spark, sf_dir, "events")
    cols = ["event_id", "user_id", "event_type", "value", "ts"]
    doubled = ev.select(*cols).union(ev.select(*cols))
    tmp = scratch_dir("stream_dd_")
    # 3 ts-ordered chunks, one file per trigger: duplicate pairs sort
    # adjacent, so dedup state must survive at least one batch boundary
    stream = replay_stream(
        spark, doubled, EVENTS_SCHEMA, tmp, n_chunks=3, order_col="ts", max_files_per_trigger=1
    )
    out = stream_dedup(stream, "ts", ["event_id"], watermark="10 seconds")
    return run_to_memory(out, spark, timeout_sec=240).select(
        "event_id", "user_id", "event_type", "value"
    )


@query(
    "streaming_late_data",
    oracle="""
    WITH fe AS (SELECT * FROM events WHERE (value IS NULL OR isfinite(value))),
    c0 AS (SELECT ts, value FROM fe WHERE event_id % 10 <> 0),
    wm1 AS (SELECT max(ts) AS w FROM c0),
    kept AS (
      SELECT ts, value, 0 AS is_late FROM c0
      UNION ALL
      -- first late wave arrives before any eviction: always merged
      SELECT ts, value, 1 FROM fe WHERE event_id % 20 = 0
      UNION ALL
      -- second late wave: dropped iff the window was already evicted, i.e.
      -- window end <= the watermark active during the PREVIOUS batch
      -- (= max on-time event time); late rows into still-live windows merge
      SELECT e.ts, e.value, 1 FROM fe e, wm1
      WHERE e.event_id % 20 = 10
        AND date_trunc('hour', e.ts) + INTERVAL 1 HOUR > wm1.w
    )
    SELECT date_trunc('hour', ts) AS window_start,
           count(*) AS n_events,
           CAST(sum(is_late) AS BIGINT) AS n_late,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents
    FROM kept
    GROUP BY 1
    HAVING date_trunc('hour', ts) + INTERVAL 1 HOUR <= (SELECT max(ts) FROM fe)
    """,
    doc="STREAMING late/out-of-order data: events replayed as 3 micro-batches "
    "— on-time rows (event_id%10!=0), then two late waves.  Pins Spark's "
    "measured late-row semantics: a late row is dropped iff its window's "
    "state was already EVICTED (window end <= watermark active in the prior "
    "batch); late rows into still-live windows merge even past the "
    "watermark.  Oracle reconstructs exactly that batch-by-batch rule",
)
def q_streaming_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    from amazon_kinesis_data_analytics_flinktableapi_spark.schemas import EVENTS_SCHEMA
    from amazon_kinesis_data_analytics_flinktableapi_spark.sources.streaming import file_replay
    from amazon_kinesis_data_analytics_flinktableapi_spark.streaming.replay import (
        dump_json_parts,
        run_to_memory,
    )

    from amazon_kinesis_data_analytics_flinktableapi_spark.functions.scalar import finite_or_null

    (ev,) = load(spark, sf_dir, "events")
    ev = ev.filter(finite_or_null("value"))  # swallow at the source (r14)
    cols = [f.name for f in EVENTS_SCHEMA.fields]
    ontime = ev.filter(F.col("event_id") % 10 != 0).select(cols)
    late1 = ev.filter(F.col("event_id") % 20 == 0).select(cols)
    late2 = ev.filter(F.col("event_id") % 20 == 10).select(cols)
    tmp = scratch_dir("stream_late_")
    dump_json_parts([ontime, late1, late2], tmp)
    stream = file_replay(spark, tmp, EVENTS_SCHEMA, 1)
    agg = (
        stream.withColumn("is_late", (F.col("event_id") % 10 == 0).cast("long"))
        .withWatermark("ts", "0 seconds")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("is_late").alias("n_late"),
            # integer cents per row, summed exactly — double sums are
            # partition-order-dependent and flake the cross-engine hash
            F.sum(F.floor(F.col("value") * 100 + 0.5)).alias("value_cents"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "n_late", "value_cents")
    )
    return run_to_memory(agg, spark, timeout_sec=240)


@query(
    "streaming_topk_complete",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n
    FROM events
    GROUP BY event_type
    ORDER BY n DESC, event_type
    LIMIT 3
    """,
    doc="STREAMING complete-mode top-k: running count per event_type with "
    "sort+limit, state carried across 3 replay micro-batches; the memory "
    "sink's final snapshot equals the batch answer (complete is the one "
    "output mode append/update queries don't cover)",
)
def q_streaming_topk_complete(spark: SparkSession, sf_dir: str) -> DataFrame:
    from amazon_kinesis_data_analytics_flinktableapi_spark.schemas import EVENTS_SCHEMA
    from amazon_kinesis_data_analytics_flinktableapi_spark.streaming.replay import (
        replay_stream,
        run_to_memory,
    )

    (ev,) = load(spark, sf_dir, "events")
    tmp = scratch_dir("stream_topk_")
    stream = replay_stream(
        spark, ev, EVENTS_SCHEMA, tmp, n_chunks=3, order_col="ts", max_files_per_trigger=1
    )
    agg = (
        stream.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "event_type")
        .limit(3)
    )
    return run_to_memory(agg, spark, timeout_sec=240, output_mode="complete")


@query(
    "streaming_cms_sketch",
    oracle="""
    WITH u AS (SELECT user_id FROM events WHERE user_id IS NOT NULL)
    SELECT d,
           ('0x' || substr(md5('cms' || d || ':' || user_id), 1, 15))::BIGINT % 256
             AS bucket,
           CAST(count(*) AS BIGINT) AS c
    FROM u CROSS JOIN range(4) t(d)
    GROUP BY 1, 2
    """,
    doc="STREAMING Count-Min sketch: the depth-4 x width-256 grid built as a "
    "complete-mode running aggregation across 3 replay micro-batches — the "
    "final snapshot equals the batch grid cell-for-cell, PROVING the "
    "sketch's merge property (cells are sums, so incremental micro-batch "
    "merges land exactly on the one-shot answer)",
)
def q_streaming_cms_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from amazon_kinesis_data_analytics_flinktableapi_spark.functions.text import md5_hash60
    from amazon_kinesis_data_analytics_flinktableapi_spark.schemas import EVENTS_SCHEMA
    from amazon_kinesis_data_analytics_flinktableapi_spark.streaming.replay import (
        replay_stream,
        run_to_memory,
    )

    (ev,) = load(spark, sf_dir, "events")
    tmp = scratch_dir("stream_cms_")
    stream = replay_stream(
        spark, ev, EVENTS_SCHEMA, tmp, n_chunks=3, order_col="ts", max_files_per_trigger=1
    )
    cells = (
        stream.filter(F.col("user_id").isNotNull())
        .select(
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(d).alias("d"),
                        (
                            md5_hash60(
                                F.concat(F.lit(f"cms{d}:"), F.col("user_id").cast("string"))
                            )
                            % 256
                        ).alias("bucket"),
                    )
                    for d in range(4)
                ])
            ).alias("e")
        )
        .groupBy(F.col("e.d").alias("d"), F.col("e.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return run_to_memory(cells, spark, timeout_sec=240, output_mode="complete")


@query(
    "streaming_chained_windows",
    oracle="""
    SELECT TIMESTAMP '1970-01-01 00:00:00'
             + CAST(floor(epoch(ts) / 10800) * 10800 AS BIGINT) * INTERVAL 1 SECOND
             AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n3
    FROM events
    GROUP BY 1, 2
    HAVING window_start + INTERVAL 3 HOUR <= (SELECT max(ts) FROM events)
    """,
    doc="STREAMING chained stateful aggregation (multiple stateful "
    "operators, Spark 3.4+): 1h tumbling counts re-aggregated into 3h "
    "windows by passing the window struct as the second agg's time column; "
    "append mode emits exactly the 3h windows the terminal watermark "
    "closes — oracle = direct 3h bucketing of the raw events",
)
def q_streaming_chained_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from amazon_kinesis_data_analytics_flinktableapi_spark.schemas import EVENTS_SCHEMA
    from amazon_kinesis_data_analytics_flinktableapi_spark.streaming.replay import (
        replay_stream,
        run_to_memory,
    )

    (ev,) = load(spark, sf_dir, "events")
    tmp = scratch_dir("stream_chain_")
    stream = replay_stream(
        spark, ev, EVENTS_SCHEMA, tmp, n_chunks=3, order_col="ts", max_files_per_trigger=1
    )
    hourly = (
        stream.withWatermark("ts", "0 seconds")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    three_hourly = (
        hourly.groupBy(F.window(F.col("w"), "3 hours").alias("w3"), "event_type")
        .agg(F.sum("n").alias("n3"))
    )
    return run_to_memory(
        three_hourly.select(
            F.col("w3.start").alias("window_start"), "event_type", "n3"
        ),
        spark,
        timeout_sec=240,
    )


@query(
    "robust_stats_mad",
    oracle="""
    WITH m AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           floor(max(m.med) * 1000000 + 0.5) / 1000000 AS value_median,
           floor(quantile_cont(abs(e.value - m.med), 0.5) * 1000000 + 0.5) / 1000000
             AS value_mad,
           count(*) AS n_events
    FROM events e JOIN m ON e.event_type = m.event_type
    GROUP BY e.event_type
    """,
    doc="robust dispersion: median absolute deviation per group — the "
    "outlier-immune stddev replacement a data-quality monitor wants; two "
    "exact-median passes with the group medians broadcast back between them",
)
def q_robust_stats_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: pass 1 aggregates per-group medians (tiny result — group
    # cardinality rows, broadcast back); pass 2 re-scans the fact once and
    # aggregates |x − med|.  MAD is inherently two-pass; the broadcast
    # keeps the second pass shuffle-free on the fact side except the final
    # per-group agg.  Identical IEEE expressions both engines: interpolated
    # median, subtraction, abs — no rounding until the output.
    def r6(c):
        return F.floor(c * 1_000_000 + 0.5) / 1_000_000

    (ev,) = load(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(F.percentile("value", F.lit(0.5)).alias("med"))
    return (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            r6(F.max("med")).alias("value_median"),
            r6(F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5))).alias("value_mad"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@query(
    "streaming_asof_enrich",
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
    ), j AS (
      SELECT o.id, o.order_time, o.amount, o.currency, r.rate_time, r.rate
      FROM o JOIN r
        ON o.currency = r.currency
       AND o.order_time >= r.rate_time
       AND r.rate_time > o.order_time - INTERVAL 1 HOUR
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY id
                                   ORDER BY rate_time DESC, rate DESC) AS rn
      FROM j
    )
    SELECT id, amount, currency, rate, amount * rate AS converted_amount
    FROM ranked
    WHERE rn = 1
      AND date_trunc('hour', order_time) + INTERVAL 1 HOUR
          <= (SELECT max(ts) FROM events
           WHERE event_id % 17 = 0 AND (value IS NULL OR isfinite(value))) - INTERVAL 1 HOUR
    """,
    doc="STREAMING as-of enrichment (Flink temporal-join analogue): "
    "stream-stream interval join chained into a per-order latest-rate "
    "aggregation — two stateful operators; append mode emits exactly the "
    "order-hour windows the rate-side output watermark (held back by the "
    "join's 1h interval bound) closes — oracle-proven",
)
def q_streaming_asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each order enriched with the LATEST rate in (t-1h, t] — the
    reference's currency-conversion use case as a true temporal join
    rather than a fan-out interval join.  Chained stateful operators
    (Spark 3.4+): watermarked stream-stream interval join, then an
    event-time-windowed max_by aggregation keyed by order.  The emission
    cutoff in the oracle is EMPIRICAL and exact: the join holds the
    output watermark back by the interval bound on the rate side, so
    order windows emit iff window_end <= max(rate ts) - interval
    (validated row-for-row at sf0.001 and sf0.01)."""
    from amazon_kinesis_data_analytics_flinktableapi_spark.operators.interval_join import (
        interval_join_bucketed,
    )
    from amazon_kinesis_data_analytics_flinktableapi_spark.schemas import (
        EXCHANGE_RATE_SCHEMA,
        ORDER_SCHEMA,
    )
    from amazon_kinesis_data_analytics_flinktableapi_spark.streaming.replay import (
        replay_stream,
        run_to_memory,
    )

    (ev,) = load(spark, sf_dir, "events")
    orders_b, rates_b = _streaming_orders_rates(ev)
    tmp = scratch_dir("stream_asof_")
    o = replay_stream(spark, orders_b, ORDER_SCHEMA, f"{tmp}/o").withWatermark(
        "orderTime", "0 seconds"
    )
    r = (
        replay_stream(spark, rates_b, EXCHANGE_RATE_SCHEMA, f"{tmp}/r")
        .withColumnRenamed("exchangeRateTime", "rateTime")
        .withWatermark("rateTime", "0 seconds")
    )
    joined = interval_join_bucketed(
        o, r, on="currency", left_time="orderTime", right_time="rateTime",
        interval="1 hour", how="inner",
    ).select(
        F.col("l.id").alias("id"),
        F.col("l.orderTime").alias("orderTime"),
        F.col("l.amount").alias("amount"),
        F.col("l.currency").alias("currency"),
        F.col("r.rateTime").alias("rateTime"),
        F.col("r.rate").alias("rate"),
    )
    # latest rate per order = max (rateTime, rate) struct — deterministic
    # tie-break, and an aggregate streaming supports (window functions are
    # batch-only); the event-time window key keeps state evictable
    agg = (
        joined.groupBy(F.window("orderTime", "1 hour").alias("w"), "id", "amount", "currency")
        .agg(F.max(F.struct(F.col("rateTime").alias("rt"), F.col("rate").alias("rate"))).alias("m"))
        .select(
            "id",
            "amount",
            "currency",
            F.col("m.rate").alias("rate"),
            (F.col("amount") * F.col("m.rate")).alias("converted_amount"),
        )
    )
    return run_to_memory(agg, spark, timeout_sec=240)


#: DuckDB regeneration of the kinesis_sim orders stream used by
#: q_streaming_kinesis_tumbling (seed 11, 2 shards x 300 records @ 100 ms)
#: — same md5 derivation as sources/kinesis_sim._record, so the oracle
#: sees the identical records the connector streams.
_KSIM_STREAM_ORDERS = """
    SELECT TIMESTAMP '2024-01-01 00:00:00'
             + (q.seq * 100 + s.shard) * INTERVAL 1 MILLISECOND AS ts,
           CAST(('0x' || substr(md5('11:' || s.shard || ':' || q.seq || ':a'), 1, 15))::BIGINT
                % 10000 + 1 AS INTEGER) AS amount,
           ['click','view','signup','purchase','error']
             [('0x' || substr(md5('11:' || s.shard || ':' || q.seq || ':c'), 1, 15))::BIGINT
              % 5 + 1] AS currency
    FROM range(2) s(shard), range(300) q(seq)
"""


@query(
    "streaming_kinesis_tumbling",
    oracle=f"""
    WITH o AS ({_KSIM_STREAM_ORDERS}),
    agg AS (
      SELECT currency,
             time_bucket(INTERVAL 5 SECONDS, ts) AS window_start,
             time_bucket(INTERVAL 5 SECONDS, ts) + INTERVAL 5 SECONDS AS window_end,
             count(*) AS n_orders,
             CAST(sum(amount) AS BIGINT) AS total_amount
      FROM o
      GROUP BY 1, 2, 3
    )
    SELECT * FROM agg
    WHERE window_end <= (SELECT max(ts) FROM o)
    """,
    doc="STREAMING tumbling window fed by the in-repo kinesis_sim connector "
    "(readStream, shard partitions, sequence-number offsets); append mode "
    "emits exactly the windows the terminal watermark closes — the oracle "
    "regenerates the connector's deterministic records in SQL",
)
def q_streaming_kinesis_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 streaming attestation for the kinesis_sim connector: the batch
    twin (``kinesis_interval_join``) proves the wire bytes; this row proves
    the *streaming* read path — readStream → JSON parse (S2) → watermark
    (S4) → windowed aggregation — inside the driver's environment.
    ``batch_records == records_per_shard`` so the whole stream arrives as
    one increment; the drain runner then keeps triggering micro-batches
    until the advanced watermark has flushed every window whose end <=
    max event time (the engine's append-mode emission contract) — a
    SimpleDataSourceStreamReader never sees availableNow's no-data flush
    batch, see ``run_to_memory_drain``.  ``sf_dir`` unused — the
    connector is the source."""
    from amazon_kinesis_data_analytics_flinktableapi_spark.schemas import ORDER_SCHEMA
    from amazon_kinesis_data_analytics_flinktableapi_spark.sources.kinesis_sim import (
        register as register_kinesis,
    )
    from amazon_kinesis_data_analytics_flinktableapi_spark.sources.streaming import parse_json_stream
    from amazon_kinesis_data_analytics_flinktableapi_spark.streaming.replay import (
        run_to_memory_drain,
    )

    register_kinesis(spark)
    raw = (
        spark.readStream.format("kinesis_sim")
        .options(
            template="orders",
            shards="2",
            records_per_shard="300",
            batch_records="300",
            interval_ms="100",
            seed="11",
        )
        .load()
    )
    parsed = parse_json_stream(raw, ORDER_SCHEMA, value_col="data")
    agg = (
        parsed.withWatermark("orderTime", "0 seconds")
        .groupBy(F.window("orderTime", "5 seconds").alias("w"), "currency")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.sum("amount").alias("total_amount"))
        .select(
            "currency",
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_orders",
            "total_amount",
        )
    )
    return run_to_memory_drain(agg, spark, timeout_sec=240)


@query(
    "streaming_kinesis_roundtrip",
    oracle="""
    SELECT s.shard * 1000000000 + q.seq AS id,
           TIMESTAMP '2024-01-01 00:00:00'
             + (q.seq * 50 + s.shard) * INTERVAL 1 MILLISECOND AS order_time,
           CAST(('0x' || substr(md5('13:' || s.shard || ':' || q.seq || ':a'), 1, 15))::BIGINT
                % 10000 + 1 AS INTEGER) AS amount,
           ['click','view','signup','purchase','error']
             [('0x' || substr(md5('13:' || s.shard || ':' || q.seq || ':c'), 1, 15))::BIGINT
              % 5 + 1] AS currency
    FROM range(2) s(shard), range(200) q(seq)
    """,
    doc="K1+K2 driver attestation: kinesis_sim stream -> kinesis_sim SINK "
    "(two-phase task-stage/driver-commit, key-hash shard routing) -> read "
    "the committed JSONL back through a distributed scan; the oracle "
    "regenerates the source records, so a hash match proves no record was "
    "lost, duplicated, or corrupted through the full write path",
)
def q_streaming_kinesis_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's sink side (StreamingJob.java:110-130) end-to-end in
    the driver's environment: a finite kinesis_sim orders stream is driven
    through ``writeStream.format("kinesis_sim")`` (availableNow — the sink
    path needs no watermark flush, unlike the windowed query), then the
    committed ``batch=*/shardId-*/*.jsonl`` files are read back with a
    DISTRIBUTED ``spark.read.json`` scan and parsed through the shared S2
    path.  ``sf_dir`` unused — the connector is the source AND the sink."""
    import glob as _glob

    from amazon_kinesis_data_analytics_flinktableapi_spark.schemas import ORDER_SCHEMA
    from amazon_kinesis_data_analytics_flinktableapi_spark.sources.kinesis_sim import (
        register as register_kinesis,
    )
    from amazon_kinesis_data_analytics_flinktableapi_spark.sources.streaming import parse_json_stream

    register_kinesis(spark)
    out = scratch_dir("ksim_rt_")
    src = (
        spark.readStream.format("kinesis_sim")
        .options(
            template="orders",
            shards="2",
            records_per_shard="200",
            batch_records="200",
            interval_ms="50",
            seed="13",
        )
        .load()
    )
    q = (
        src.writeStream.format("kinesis_sim")
        .option("path", out)
        .option("partition_key_col", "partition_key")
        .option("shards", "4")
        .option("checkpointLocation", f"{out}/.ckpt")
        .trigger(availableNow=True)
        .start()
    )
    # availableNow's awaitTermination returns False on timeout rather
    # than raising — swallowing that would glob a partially-committed
    # output while the query keeps writing (run_to_memory documents the
    # same hazard); 240s matches every other streaming query's budget
    if not q.awaitTermination(240):
        q.stop()
        raise TimeoutError("kinesis roundtrip sink did not finish in 240s")
    files = _glob.glob(f"{out}/batch=*/shardId-*/*.jsonl")
    raw = spark.read.json(files).select(F.col("data"))
    parsed = parse_json_stream(raw, ORDER_SCHEMA, value_col="data")
    return parsed.select(
        "id",
        F.col("orderTime").alias("order_time"),
        "amount",
        "currency",
    )


@query(
    "streaming_sequence_detect",
    oracle="""
    SELECT s.user_id, s.ts AS s_ts, p.ts AS p_ts
    FROM events s JOIN events p
      ON s.user_id = p.user_id
     AND s.event_type = 'signup' AND p.event_type = 'purchase'
     AND p.ts > s.ts AND p.ts <= s.ts + INTERVAL 6 HOUR
    """,
    doc="STREAMING CEP sequence detection: signup-then-purchase within 6h "
    "as a watermarked stream-stream SELF-join (two readers over the same "
    "replayed stream, one per pattern step) — matched pairs equal the "
    "batch interval self-join exactly",
)
def q_streaming_sequence_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming MATCH_RECOGNIZE-lite: each pattern step is a
    filtered reader over the same source, and the step constraint is the
    interval join's time bound — state for each side is evicted once the
    watermark passes the 6h window, exactly like the reference's
    orders-rates join with the roles self-assigned.  Scale: both sides
    pre-filter to their step's type at the scan, the join key is the
    high-cardinality user_id — no skew; state is bounded by the interval."""
    from amazon_kinesis_data_analytics_flinktableapi_spark.schemas import EVENTS_SCHEMA
    from amazon_kinesis_data_analytics_flinktableapi_spark.streaming.replay import (
        replay_stream,
        run_to_memory,
    )

    from amazon_kinesis_data_analytics_flinktableapi_spark.sources.streaming import file_replay
    from amazon_kinesis_data_analytics_flinktableapi_spark.streaming.replay import dump_json_chunks

    (ev,) = load(spark, sf_dir, "events")
    tmp = scratch_dir("stream_seq_")
    # dump ONCE, replay twice: the two sides read byte-identical fixtures,
    # so a second full-table JSON serialization buys nothing
    dump_json_chunks(ev, tmp, n_chunks=3, order_col="ts")
    s_stream = file_replay(spark, tmp, EVENTS_SCHEMA, max_files_per_trigger=1)
    p_stream = file_replay(spark, tmp, EVENTS_SCHEMA, max_files_per_trigger=1)
    s = (
        s_stream.filter(F.col("event_type") == "signup")
        .select("user_id", F.col("ts").alias("s_ts"))
        .withWatermark("s_ts", "0 seconds")
    )
    p = (
        p_stream.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "0 seconds")
    )
    joined = s.join(
        p,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") > F.col("s_ts"))
        & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 6 HOURS")),
    ).select("user_id", "s_ts", "p_ts")
    return run_to_memory(joined, spark, timeout_sec=240)

"""Relational capability completion (SURVEY.md §7 phase 3).

The reference sits on the full Flink Table API surface but exercises only a
slice (§2 coverage checklist: aggregations, windows, sorts, set ops are
ABSENT from its one query).  These queries complete the surface so arbitrary
user queries in the reference's style run on this engine — each implemented
DataFrame-native (Catalyst plans the physical strategy) with a DuckDB
oracle twin.

Spark/DuckDB dialect-portability rules applied throughout so the value
hashes compare exactly:
- double aggregates rounded (sum→2dp, avg→4dp) so partial-aggregation
  order differences stay below the hash;
- every ORDER BY ... LIMIT carries a unique tie-break key;
- FLOOR before any double→int conversion (Spark truncates, DuckDB rounds).

Scale notes are on each query: what shuffles, what broadcasts, what the
plan must look like at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from amazon_kinesis_data_analytics_flinktableapi_spark.queries import load, query


@query(
    "agg_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           -- integer units end-to-end (nation_pair_revenue convention):
           -- round(sum(double)) is summation-order-sensitive at rounding
           -- boundaries, a latent hash-flake against regenerated TESTDATA.
           -- Inputs are exact decimals (qty integer, price 2-dec, price×
           -- (1−disc) 4-dec), so the quantized sums are EXACT and the
           -- output matches the old expression everywhere it was stable.
           CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS sum_base_price,
           CAST(floor((sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) + 50) / 100.0) AS BIGINT) / 100.0 AS sum_disc_price,
           floor(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) * 10000.0 / count(l_quantity) + 0.5) / 10000.0 AS avg_qty,
           floor(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) * 100.0 / count(l_extendedprice) + 0.5) / 10000.0 AS avg_price,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    headline=True,
    doc="TPC-H Q1 shape: scan-heavy grouped aggregation; map-side partial agg + tiny shuffle",
)
def q_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: partial aggregation reduces each partition to ≤|groups| rows
    # (6 groups here) before the shuffle — the plan at 100 TB is scan-bound,
    # which is exactly right.  Filter + column pruning reach the parquet scan.
    (li,) = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # integer units end-to-end — see the oracle comment
            (F.sum(F.floor(F.col("l_quantity") + 0.5).cast("bigint")) * 1.0).alias("sum_qty"),
            (F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint")) / 100.0).alias("sum_base_price"),
            (F.floor((F.sum(F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000 + 0.5).cast("bigint")) + 50) / 100.0).cast("bigint") / 100.0).alias("sum_disc_price"),
            (F.floor(F.sum(F.floor(F.col("l_quantity") + 0.5).cast("bigint")) * 10000.0 / F.count("l_quantity") + 0.5) / 10000.0).alias("avg_qty"),
            (F.floor(F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint")) * 100.0 / F.count("l_extendedprice") + 0.5) / 10000.0).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "join_revenue_by_nation",
    oracle="""
    SELECT n_name,
           -- exact cents sum (see agg_pricing_summary oracle comment)
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS revenue,
           count(*) AS n_orders
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    headline=True,
    doc="fact-to-dim star join: broadcast the dims, shuffle only the fact once",
)
def q_join_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: nation (25 rows) is explicitly broadcast — no shuffle for the
    # dim side ever.  customer⋈orders shuffles on custkey once; the final
    # agg re-uses tiny group cardinality (25).  At 100 TB the single fact
    # shuffle on the join key is the unavoidable minimum, and AQE handles
    # custkey skew.
    customer, orders, nation = load(spark, sf_dir, "customer", "orders", "nation")
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            (F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")) / 100.0).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@query(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    doc="global top-k: per-partition TakeOrdered + merge, never a full sort",
)
def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: orderBy+limit compiles to TakeOrderedAndProject — each partition
    # keeps its local top-10, driver merges k*partitions rows.  No global
    # sort/shuffle of 100 TB.  Unique tie-break key keeps it deterministic.
    (orders,) = load(spark, sf_dir, "orders")
    return orders.select("o_orderkey", "o_custkey", "o_totalprice").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    ).limit(10)


@query(
    "window_rank",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) t
    WHERE rn <= 3
    """,
    doc="OVER ranking: top-3 orders per customer via row_number",
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: one shuffle on the partition key; rank computed within sorted
    # partitions.  High-cardinality o_custkey distributes well; AQE splits
    # stragglers.
    (orders,) = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        orders.select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


@query(
    "window_moving_avg",
    oracle="""
    SELECT event_id, user_id, value,
           round(avg(value) OVER (PARTITION BY user_id
                                  ORDER BY ts NULLS LAST, event_id
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg
    FROM events
    """,
    doc="OVER analytic: per-user 3-row moving average in event-time order",
)
def q_window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    (ev,) = load(spark, sf_dir, "events")
    # NULLS LAST pinned on both engines — see queries/mining.py cusum note
    w = Window.partitionBy("user_id").orderBy(
        F.asc_nulls_last("ts"), "event_id"
    ).rowsBetween(-2, 0)
    return ev.select(
        "event_id", "user_id", "value", F.round(F.avg("value").over(w), 4).alias("moving_avg")
    )


@query(
    "set_ops",
    oracle="""
    (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
     UNION
     SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="UNION (distinct) + EXCEPT over customer keys",
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: union is a zero-shuffle concat; the distinct/except shuffle on
    # the single key column only (bytes-minimal after early projection).
    customer, orders = load(spark, sf_dir, "customer", "orders")
    building = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rich = customer.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    finished = orders.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("c_custkey"))
    return building.union(rich).distinct().exceptAll(finished.distinct())


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 100000)
    """,
    doc="left-semi join: customers having at least one big order",
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: semi join never materializes the fan-out — Spark's LeftSemi
    # short-circuits on first match; filter pushed below the join.
    customer, orders = load(spark, sf_dir, "customer", "orders")
    big = orders.filter(F.col("o_totalprice") > 100000)
    return customer.join(big, F.col("c_custkey") == F.col("o_custkey"), "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
    """,
    doc="left-anti join: customers with no pending orders",
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders = load(spark, sf_dir, "customer", "orders")
    pending = orders.filter(F.col("o_orderstatus") == "P")
    return customer.join(pending, F.col("c_custkey") == F.col("o_custkey"), "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "rollup_customer_geo",
    oracle="""
    SELECT coalesce(r_name, 'ALL') AS region_name,
           coalesce(n_name, 'ALL') AS nation_name,
           count(*) AS n_customers,
           CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    doc="GROUP BY ROLLUP: region → nation → grand-total hierarchy",
)
def q_rollup_customer_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: rollup expands each row to 3 grouping sets *after* partial
    # aggregation; both dims broadcast, so the only shuffle is the tiny
    # grouped result.
    customer, nation, region = load(spark, sf_dir, "customer", "nation", "region")
    joined = customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")).join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            # exact cents sum (see agg_pricing_summary oracle comment)
            (F.sum(F.floor(F.col("c_acctbal") * 100 + 0.5).cast("bigint")) / 100.0).alias("total_bal"),
        )
        .select(
            F.coalesce(F.col("r_name"), F.lit("ALL")).alias("region_name"),
            F.coalesce(F.col("n_name"), F.lit("ALL")).alias("nation_name"),
            "n_customers",
            "total_bal",
        )
    )


@query(
    "large_order_customers",
    oracle="""
    SELECT c_name, o_orderkey, o_orderdate, o_totalprice,
           CAST(sum(l_quantity) AS BIGINT) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
    )
    GROUP BY c_name, o_orderkey, o_orderdate, o_totalprice
    """,
    doc="TPC-H q18 pattern: orders above a total-quantity threshold "
    "(aggregated IN-subquery), joined back to customers",
)
def q_large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: the qualifying-orderkey set is a pre-aggregated semi-join
    # side (tiny after HAVING) — broadcast it into the fact join so the
    # only big shuffle is orders⋈lineitem on orderkey.
    customer, orders, lineitem = load(spark, sf_dir, "customer", "orders", "lineitem")
    qualifying = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__q"))
        .filter(F.col("__q") > 150)
        .select("l_orderkey")
    )
    return (
        lineitem.join(F.broadcast(qualifying), "l_orderkey", "left_semi")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").cast("bigint").alias("total_qty"))
    )


@query(
    "nation_pair_revenue",
    oracle="""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           count(*) AS n_items,
           CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT)
             / 100.0 AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE cn.n_name <> sn.n_name
    GROUP BY 1, 2
    """,
    headline=True,
    doc="TPC-H q7 pattern: cross-nation trade revenue — 5-way join with "
    "two roles of the nation dimension",
)
def q_nation_pair_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: both nation roles broadcast (25 rows); supplier broadcasts at
    # any realistic SF; the remaining shuffles are lineitem⋈orders on
    # orderkey and ⋈customer on custkey — the minimum for this shape.
    customer, orders, lineitem, supplier, nation = load(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation"
    )
    cn = nation.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    sn = nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            # per-item half-up to integer CENTS, then an exact integer sum:
            # summing raw doubles puts the last cent at double's precision
            # edge where partition order decides it — engines disagree
            (F.sum(F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5)) / 100.0).alias("revenue"),
        )
    )


@query(
    "cube_status_priority",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           GROUPING(o_orderstatus, o_orderpriority) AS gid,
           count(*) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="GROUP BY CUBE: all 4 grouping sets over (status, priority) with "
    "grouping_id disambiguation",
)
def q_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: like rollup, cube expands to grouping sets after map-side
    # partial aggregation — shuffle carries only (status, priority, gid)
    # partials, 4× a tiny grouped result, never 4× the scan.
    (orders,) = load(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            # exact cents sum (see agg_pricing_summary oracle comment)
            (F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")) / 100.0).alias("total_price"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "gid",
            "n_orders",
            "total_price",
        )
    )


@query(
    "unpivot_lineitem_metrics",
    oracle="""
    SELECT l_returnflag, metric,
           CAST(count(*) AS BIGINT) AS n,
           floor(sum(CAST(floor(val * 100 + 0.5) AS BIGINT)) * 1.0 + 0.5) / 100.0 AS total
    FROM (
      SELECT l_returnflag, l_quantity, l_extendedprice, l_discount FROM lineitem
    ) UNPIVOT (val FOR metric IN (l_quantity, l_extendedprice, l_discount))
    GROUP BY l_returnflag, metric
    """,
    doc="UNPIVOT/melt: wide metric columns to long (metric, value) rows, "
    "re-aggregated per returnflag — the reshape operator",
)
def q_unpivot_lineitem_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: unpivot is a scan-side row expansion (3× narrow rows, no
    # shuffle); the only exchange is the small grouped result.  Values
    # sum as per-item half-up integer cents (fp-order-proof, see
    # nation_pair_revenue).
    (lineitem,) = load(spark, sf_dir, "lineitem")
    long = lineitem.unpivot(
        ids=["l_returnflag"],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="metric",
        valueColumnName="val",
    )
    return long.groupBy("l_returnflag", "metric").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(F.floor(F.col("val") * 100 + 0.5)) / 100.0).alias("total"),
    )


@query(
    "value_histogram",
    oracle="""
    SELECT event_type,
           CAST(floor(value / 50.0) AS BIGINT) AS bin,
           count(*) AS n
    FROM events
    WHERE (value IS NULL OR isfinite(value))
    GROUP BY 1, 2
    """,
    doc="histogram binning: fixed-width value buckets per key (the "
    "distribution-profiling scan)",
)
def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from amazon_kinesis_data_analytics_flinktableapi_spark.functions.scalar import finite_or_null

    (ev,) = load(spark, sf_dir, "events")
    ev = ev.filter(finite_or_null("value"))  # non-finite swallow (r14)
    return (
        ev.groupBy(
            "event_type", F.floor(F.col("value") / 50.0).cast("bigint").alias("bin")
        ).agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "grouped_having",
    oracle="""
    SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total_value
    FROM events
    GROUP BY user_id
    HAVING count(*) >= 20
    """,
    doc="GROUP BY + HAVING on the events stream table",
)
def q_grouped_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    (ev,) = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .filter(F.col("n_events") >= 20)
    )


@query(
    "distinct_pairs",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
    doc="DISTINCT: hash-aggregate dedup of a projected pair",
)
def q_distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    (ev,) = load(spark, sf_dir, "events")
    return ev.select("user_id", "event_type").distinct()


@query(
    "tumbling_window_events",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    headline=True,
    doc="tumbling event-time window aggregation (batch twin of the streaming window op)",
)
def q_tumbling_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Batch twin of streaming.windows: date_trunc is the deterministic
    # SQL-expressible form of window(ts, '1 hour').start; the streaming
    # variant (tests/test_streaming_*) uses window() + watermark and must
    # produce these exact rows when replayed.
    (ev,) = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("window_start"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
    )


@query(
    "sliding_window_events",
    oracle="""
    WITH starts AS (
      -- ts IS NOT NULL: Spark's window() generator emits zero covering
      -- windows for a NULL event time (the row is excluded), so the
      -- oracle excludes it too
      SELECT date_trunc('hour', ts) AS ws, event_type, value FROM events
      WHERE ts IS NOT NULL AND (value IS NULL OR isfinite(value))
      UNION ALL
      SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR, event_type, value FROM events
      WHERE ts IS NOT NULL AND (value IS NULL OR isfinite(value))
    )
    SELECT ws AS window_start, event_type,
           count(*) AS n_events,
           -- integer milli-units end-to-end: round(sum(double)) is
           -- summation-ORDER-sensitive at the rounding boundary (the skew
           -- fixture hit 1312.715); quantize per row, sum exact BIGINTs,
           -- half-up to 2 decimals in integer space
           CAST(floor((sum(CAST(floor(value * 1000 + 0.5) AS BIGINT)) + 5) / 10.0)
                AS BIGINT) / 100.0 AS total_value
    FROM starts
    GROUP BY 1, 2
    """,
    doc="sliding event-time windows (2h window, 1h slide) — batch twin via window()",
)
def q_sliding_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F.window with a slide explodes each event into its 2 covering
    # windows; the oracle enumerates the same covers as a 2-way union.
    from amazon_kinesis_data_analytics_flinktableapi_spark.functions.scalar import finite_or_null

    (ev,) = load(spark, sf_dir, "events")
    ev = ev.filter(finite_or_null("value"))  # non-finite swallow (r14)
    # integer milli-unit totals — see the oracle comment
    mv = F.floor(F.col("value") * 1000 + 0.5).cast("bigint")
    return (
        ev.select("ts", "event_type", mv.alias("__mv"))
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.floor((F.sum("__mv") + 5) / 10).cast("bigint") / 100.0).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


@query(
    "conditional_agg",
    oracle="""
    SELECT o_orderpriority,
           CAST(sum(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
           count(*) AS n_total
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="conditional aggregation (CASE WHEN pivot style)",
)
def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = load(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.sum(F.when(F.col("o_totalprice") > 150000, 1).otherwise(0)).alias("n_big"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_finished"),
        F.count(F.lit(1)).alias("n_total"),
    )


@query(
    "shipping_priority",
    oracle="""
    SELECT l_orderkey,
           -- exact 4-dec sum, integer half-up to cents (see
           -- agg_pricing_summary oracle comment)
           CAST(floor((sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) + 50) / 100.0) AS BIGINT) / 100.0 AS revenue,
           o_orderdate
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15'
      AND l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    headline=True,
    doc="TPC-H Q3 shape: selective 3-way join + agg + top-k",
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: both filters push to their scans before the joins; the
    # customer side shrinks ~5× before shuffling; top-k avoids global sort.
    customer, orders, lineitem = load(spark, sf_dir, "customer", "orders", "lineitem")
    return (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders.filter(F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")),
              F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem.filter(F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            # exact 4-dec sum, integer half-up to cents
            (F.floor((F.sum(F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000 + 0.5).cast("bigint")) + 50) / 100.0).cast("bigint") / 100.0).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "string_functions",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           length(p_name) AS name_len,
           substr(p_type, 1, 5) AS type_prefix,
           concat(p_brand, ':', p_type) AS brand_type,
           replace(p_name, ' ', '_') AS name_snake
    FROM part
    WHERE p_name LIKE '%a%'
    """,
    doc="scalar string library: upper/length/substr/concat/replace/LIKE",
)
def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    (part,) = load(spark, sf_dir, "part")
    return part.filter(F.col("p_name").like("%a%")).select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
    )


@query(
    "math_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(sqrt(l_quantity), 6) AS qty_sqrt,
           round(ln(l_extendedprice), 6) AS price_ln,
           round(abs(l_discount - 0.05), 6) AS disc_dev,
           CAST(FLOOR(l_quantity) AS INTEGER) % 7 AS qty_mod
    FROM lineitem
    WHERE l_quantity > 0
    """,
    doc="scalar math library: sqrt/ln/abs/floor/mod",
)
def q_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = load(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_quantity") > 0).select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("disc_dev"),
        (F.floor("l_quantity").cast("int") % 7).alias("qty_mod"),
    )


@query(
    "date_functions",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS order_year,
           month(o_orderdate) AS order_month,
           day(o_orderdate) AS order_day,
           dayofweek(o_orderdate) AS order_dow
    FROM orders
    WHERE year(o_orderdate) = 1995
    """,
    doc="datetime extraction library: year/month/day/dayofweek",
)
def q_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    # dayofweek: Spark is 1=Sunday..7=Saturday; DuckDB dayofweek is
    # 0=Sunday..6 — normalize Spark's to DuckDB's numbering via -1.
    (orders,) = load(spark, sf_dir, "orders")
    return orders.filter(F.year("o_orderdate") == 1995).select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        (F.dayofweek("o_orderdate") - 1).alias("order_dow"),
    )


@query(
    "grouping_sets_revenue",
    oracle="""
    SELECT n_name, o_orderstatus,
           CAST(GROUPING(n_name, o_orderstatus) AS BIGINT) AS gid,
           CAST(sum(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
           count(*) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((n_name, o_orderstatus), (n_name), ())
    """,
    doc="explicit GROUPING SETS with grouping_id: per (nation, status), "
    "per nation, and grand total in one pass",
)
def q_grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One shuffle produces all three aggregation levels (Expand + single
    # hash-agg) — at 100 TB this beats three separate groupBys by 3× on
    # fact-table scans.  Integer-cents summation: exact, no double-sum
    # ordering flake, and CAST keeps DuckDB's HUGEINT out of the hash.
    load(spark, sf_dir, "orders", "customer", "nation")
    return spark.sql(
        """
        SELECT n_name, o_orderstatus,
               grouping_id() AS gid,
               sum(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS revenue_cents,
               count(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY GROUPING SETS ((n_name, o_orderstatus), (n_name), ())
        """
    )


@query(
    "tpch_q8_market_share",
    oracle="""
    WITH volumes AS (
      SELECT year(o_orderdate) AS o_year,
             CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) AS volume_cents,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      JOIN part     ON l_partkey = p_partkey
      WHERE r_name = 'AMERICA' AND p_type = 'MEDIUM'
    )
    SELECT o_year,
           floor(CAST(sum(CASE WHEN supp_nation = 'BRAZIL' THEN volume_cents ELSE 0 END) AS DOUBLE)
                 / CAST(sum(volume_cents) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS mkt_share,
           CAST(sum(volume_cents) AS BIGINT) AS total_volume_cents
    FROM volumes
    GROUP BY o_year
    """,
    doc="TPC-H Q8 shape: BRAZIL's market share of MEDIUM-type part revenue "
    "among AMERICA-region customers, per order year",
)
def q_tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Star-join chain: lineitem (fact) joins 7 dims — every dim side is
    # broadcastable; the only fact shuffle is the final groupBy on o_year.
    # Integer-cents volumes make the share numerator/denominator exact ints,
    # so the double division is bit-identical across engines.
    lineitem, orders, customer, nation, region, supplier, part = load(
        spark, sf_dir, "lineitem", "orders", "customer", "nation", "region", "supplier", "part"
    )
    n1 = nation.alias("n1")
    n2 = nation.alias("n2")
    vol = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1.n_nationkey"))
        .join(F.broadcast(region), F.col("n1.n_regionkey") == F.col("r_regionkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2.n_nationkey"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .filter((F.col("r_name") == "AMERICA") & (F.col("p_type") == "MEDIUM"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5)
            .cast("bigint").alias("volume_cents"),
            F.col("n2.n_name").alias("supp_nation"),
        )
    )
    brazil = F.sum(F.when(F.col("supp_nation") == "BRAZIL", F.col("volume_cents")).otherwise(0))
    total = F.sum("volume_cents")
    return vol.groupBy("o_year").agg(
        (F.floor(brazil.cast("double") / total.cast("double") * 1_000_000 + 0.5) / 1_000_000)
        .alias("mkt_share"),
        total.cast("bigint").alias("total_volume_cents"),
    )


@query(
    "tpch_q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(sum(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
    doc="TPC-H Q5: local supplier volume — revenue by nation where customer "
    "and supplier share the nation, ASIA region, one order year.  Completes "
    "the full TPC-H 22-query suite in the registry (Q1/Q3/Q7 appear as "
    "agg_pricing_summary / shipping_priority / nation_pair_revenue).",
)
def q_tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan shape: the o_orderdate year filter is pushed to the orders
    parquet scan BEFORE the fact join (pruning ~6/7 of orders), then
    lineitem joins the filtered orders/customer chain on its keys;
    supplier, nation and region are broadcast (the c_nationkey =
    s_nationkey locality constraint rides the broadcast-hash join as a
    residual equi-condition, never a shuffle of its own).  Integer-cents
    summation keeps the money sum order-independent and engine-exact
    (the repo's TPC-H rounding convention)."""
    customer, orders, lineitem, supplier, nation, region = load(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region"
    )
    yr = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    joined = (
        lineitem.join(yr, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
    )
    cents = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5).cast(
        "bigint"
    )
    return joined.groupBy("n_name").agg(F.sum(cents).cast("bigint").alias("revenue_cents"))


@query(
    "salted_join_revenue",
    oracle="""
    SELECT n_name,
           CAST(sum(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
           count(*) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    doc="skew-salted join, oracle-proven equivalent to the plain join: "
    "orders salted 16 ways against a replicated customer-nation dim",
)
def q_salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The manual skew defense (operators/skew.salted_join) as a driver
    # query: the oracle is the PLAIN join — proving salting changes the
    # physical distribution, never the result.  Here customer×nation (the
    # replicated small side) stands in for a hot-key dim; at 100 TB the
    # same shape spreads a hot customer over 16 reducers.
    from amazon_kinesis_data_analytics_flinktableapi_spark.operators.skew import salted_join

    orders, customer, nation = load(spark, sf_dir, "orders", "customer", "nation")
    dim = (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(F.col("c_custkey").alias("o_custkey"), "n_name")
    )
    joined = salted_join(orders.select("o_custkey", "o_totalprice"), dim, key="o_custkey", n_salts=16)
    return joined.groupBy("n_name").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")).alias("revenue_cents"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "regex_extract_tokens",
    oracle="""
    WITH ex AS (
      SELECT doc_id, unnest(regexp_extract_all(text, '[A-Za-z]{4,}')) AS tok
      FROM documents
    )
    SELECT tok, count(*) AS freq, count(DISTINCT doc_id) AS n_docs
    FROM ex
    GROUP BY tok
    HAVING count(*) >= 20
    """,
    doc="regexp_extract_all + explode: corpus-wide 4+-letter-token frequency "
    "(the regex-mining shape for PII/quality scans; pattern is RE2- and "
    "Java-regex identical)",
)
def q_regex_extract_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Regex evaluation happens in the scan stage (codegen), explode fans out
    # in-stage; the single shuffle is the groupBy on the extracted token.
    (docs,) = load(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id", F.explode(F.regexp_extract_all("text", F.lit("[A-Za-z]{4,}"), 0)).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"), F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("freq") >= 20)
    )


@query(
    "tpch_q21_late_supplier",
    oracle="""
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier, lineitem l1, orders
    WHERE s_suppkey = l1.l_suppkey
      AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND CAST(l1.l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND CAST(l3.l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + INTERVAL 60 DAY
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    doc="TPC-H Q21 shape (adapted: lateness = shipdate > orderdate + 60d — "
    "this schema has no commit/receipt dates): suppliers who were the SOLE "
    "late shipper on multi-supplier finished orders.  EXISTS -> left-semi "
    "join, NOT EXISTS -> left-anti join, both shuffled on l_orderkey; "
    "supplier dim broadcast.",
)
def q_tpch_q21_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders, supplier = load(spark, sf_dir, "lineitem", "orders", "supplier")
    f_orders = orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", F.to_date("o_orderdate").alias("o_date")
    )
    # late lines of finished orders — referenced three times (base, the
    # NOT-EXISTS probe side) so cache the slim projection
    late = (
        li.join(f_orders, li.l_orderkey == f_orders.o_orderkey)
        .filter(F.to_date("l_shipdate") > F.date_add(F.col("o_date"), 60))
        .select("l_orderkey", "l_suppkey")
        .cache()
    )
    all_lines = li.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    # EXISTS: some other supplier shipped on the same order
    waiting = late.join(
        all_lines,
        (late.l_orderkey == all_lines.ok2) & (late.l_suppkey != all_lines.sk2),
        "left_semi",
    )
    # NOT EXISTS: ... but no other supplier was ALSO late on it
    late_others = late.select(
        F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3")
    ).distinct()
    sole = waiting.join(
        late_others,
        (waiting.l_orderkey == late_others.ok3) & (waiting.l_suppkey != late_others.sk3),
        "left_anti",
    )
    return (
        sole.join(F.broadcast(supplier), sole.l_suppkey == supplier.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@query(
    "tpch_q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                           AS BIGINT)) AS BIGINT) AS rev_cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-07-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, rev_cents
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE rev_cents = (SELECT max(rev_cents) FROM rev)
    """,
    doc="TPC-H Q15 shape: top revenue supplier(s) for a half-year — "
    "aggregate-of-aggregate via scalar subquery; revenue in integer cents "
    "(floor half-up) so the double product is engine-exact",
)
def q_tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, supplier = load(spark, sf_dir, "lineitem", "supplier")
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
    ).cast("long")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(cents).alias("rev_cents"))
    )
    # scalar max as a 1-row broadcast: plans as BroadcastNestedLoopJoin on
    # a single row — the distributed form of Q15's scalar subquery (rev is
    # computed once; Catalyst reuses the exchange for both references)
    max_rev = rev.agg(F.max("rev_cents").alias("max_rev"))
    return (
        rev.join(F.broadcast(max_rev), F.col("rev_cents") == F.col("max_rev"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "rev_cents")
    )


@query(
    "topp_cumulative_share",
    oracle="""
    WITH per_user AS (
      SELECT event_type, user_id,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
      FROM events
      WHERE (value IS NULL OR isfinite(value))
      GROUP BY event_type, user_id
    ),
    ranked AS (
      SELECT event_type, user_id, cents,
             sum(cents) OVER (PARTITION BY event_type
                              ORDER BY cents DESC, user_id
                              ROWS UNBOUNDED PRECEDING) AS cum,
             sum(cents) OVER (PARTITION BY event_type) AS tot
      FROM per_user
    )
    SELECT event_type, user_id, cents
    FROM ranked
    WHERE (cum - cents) * 10 < tot * 9
    """,
    doc="top-p (nucleus) selection: per event_type keep the heaviest users "
    "until cumulative value share reaches 90% — running-sum window + "
    "all-integer share comparison ((cum-cents)*10 < tot*9: no doubles, no "
    "rounding, engine-exact)",
)
def q_topp_cumulative_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from amazon_kinesis_data_analytics_flinktableapi_spark.functions.scalar import finite_or_null

    (ev,) = load(spark, sf_dir, "events")
    ev = ev.filter(finite_or_null("value"))  # non-finite swallow (r14)
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("cents")
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy(F.desc("cents"), "user_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("event_type")
    ranked = per_user.select(
        "event_type",
        "user_id",
        "cents",
        F.sum("cents").over(w_cum).alias("cum"),
        F.sum("cents").over(w_tot).alias("tot"),
    )
    return ranked.filter((F.col("cum") - F.col("cents")) * 10 < F.col("tot") * 9).select(
        "event_type", "user_id", "cents"
    )


@query(
    "global_sort_index",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           CAST(row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey)
                AS BIGINT) AS global_id
    FROM orders
    """,
    doc="contiguous global ranking WITHOUT the single-partition sort "
    "bottleneck: range-repartition on the sort key, rank locally, add "
    "per-partition offsets (an n_partitions-row table) — identical output "
    "to row_number() OVER (ORDER BY ...) at any partition-boundary "
    "placement, since the key is a total order",
)
def q_global_sort_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from amazon_kinesis_data_analytics_flinktableapi_spark.operators.ranking import global_row_number

    (orders,) = load(spark, sf_dir, "orders")
    return global_row_number(
        orders.select("o_orderkey", "o_totalprice"),
        order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey")],
        id_name="global_id",
    )


@query(
    "merge_upsert_snapshot",
    oracle="""
    WITH updates AS (
      SELECT o_orderkey, o_custkey,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) + 10000 AS price_cents,
             'updated' AS op
      FROM orders WHERE o_orderkey % 10 = 0
      UNION ALL
      SELECT o_orderkey + 10000000, o_custkey,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT), 'inserted'
      FROM orders WHERE o_orderkey % 1000 = 0
    ),
    base AS (
      SELECT o_orderkey, o_custkey,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents,
             'kept' AS op
      FROM orders
    )
    SELECT COALESCE(u.o_orderkey, b.o_orderkey) AS o_orderkey,
           COALESCE(u.o_custkey, b.o_custkey) AS o_custkey,
           COALESCE(u.price_cents, b.price_cents) AS price_cents,
           COALESCE(u.op, b.op) AS op
    FROM base b FULL OUTER JOIN updates u ON b.o_orderkey = u.o_orderkey
    """,
    doc="CDC merge-upsert (SCD1) without a table format: full-outer join of "
    "the base snapshot with an update/insert batch, updates win via "
    "COALESCE — one shuffle on the merge key; the join-based MERGE INTO "
    "equivalent when no Delta/Iceberg is available",
)
def q_merge_upsert_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = load(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    base = orders.select(
        "o_orderkey", "o_custkey", cents.alias("price_cents"), F.lit("kept").alias("op")
    )
    updates = (
        orders.filter(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey", "o_custkey",
            (cents + 10000).alias("price_cents"), F.lit("updated").alias("op"),
        )
        .union(
            orders.filter(F.col("o_orderkey") % 1000 == 0).select(
                (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
                "o_custkey", cents.alias("price_cents"), F.lit("inserted").alias("op"),
            )
        )
    )
    b, u = base.alias("b"), updates.alias("u")
    merged = b.join(u, F.col("b.o_orderkey") == F.col("u.o_orderkey"), "full_outer")
    return merged.select(
        F.coalesce(F.col("u.o_orderkey"), F.col("b.o_orderkey")).alias("o_orderkey"),
        F.coalesce(F.col("u.o_custkey"), F.col("b.o_custkey")).alias("o_custkey"),
        F.coalesce(F.col("u.price_cents"), F.col("b.price_cents")).alias("price_cents"),
        F.coalesce(F.col("u.op"), F.col("b.op")).alias("op"),
    )


@query(
    "map_functions",
    oracle="""
    WITH m AS (
      SELECT event_id,
             MAP {'type': event_type, 'uid': CAST(user_id AS VARCHAR)} AS mp
      FROM events
    )
    SELECT event_id,
           mp['type'][1] AS m_type,
           mp['uid'][1] AS m_uid,
           CAST(cardinality(mp) AS BIGINT) AS m_size,
           array_to_string(map_keys(mp), ',') AS keys_csv
    FROM m
    """,
    doc="map scalar-function family: create_map / element_at / map_keys / "
    "cardinality (closes the map slot of the scalar library next to "
    "string/math/date/json/array)",
)
def q_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    (ev,) = load(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"), F.lit("uid"), F.col("user_id").cast("string")
    )
    return ev.select(
        "event_id",
        F.element_at(m, "type").alias("m_type"),
        F.element_at(m, "uid").alias("m_uid"),
        F.size(m).cast("long").alias("m_size"),
        F.array_join(F.map_keys(m), ",").alias("keys_csv"),
    )


@query(
    "try_arithmetic",
    oracle="""
    SELECT event_id,
           CASE WHEN user_id % 5 = 0 THEN NULL
                ELSE value / (user_id % 5) END AS safe_div,
           CASE WHEN user_id BETWEEN -1 AND 1
                THEN user_id * 9000000000000000000 ELSE NULL END AS safe_mul
    FROM events
    """,
    doc="ANSI-safe arithmetic (try_divide / try_multiply): divide-by-zero "
    "and bigint overflow yield NULL instead of failing the job — at corpus "
    "scale one poison row must never kill a 1000-executor stage",
)
def q_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    (ev,) = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.try_divide(F.col("value"), F.col("user_id") % 5).alias("safe_div"),
        F.try_multiply(F.col("user_id"), F.lit(9_000_000_000_000_000_000)).alias("safe_mul"),
    )


@query(
    "tpch_q13_custdist",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
    doc="TPC-H Q13 shape: distribution of order counts per customer — "
    "left join keeps zero-order customers (count(col) skips the NULLs), "
    "then a second aggregation over the counts",
)
def q_tpch_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders = load(spark, sf_dir, "customer", "orders")
    per_cust = (
        customer.join(
            orders.filter(F.col("o_orderpriority") != "1-URGENT"),
            customer.c_custkey == orders.o_custkey,
            "left",
        )
        .groupBy(customer.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "tpch_q22_idle_customers",
    oracle="""
    WITH bal AS (
      SELECT CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents,
             CAST(count(*) AS BIGINT) AS n
      FROM customer WHERE c_acctbal > 0
    )
    SELECT CAST(c_custkey % 10 AS BIGINT) AS code,
           CAST(count(*) AS BIGINT) AS numcust,
           CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS totacctbal_cents
    FROM customer, bal
    WHERE CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) * n > total_cents
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    GROUP BY 1
    """,
    doc="TPC-H Q22 shape (no phone column — cntrycode = custkey % 10): customers "
    "with above-average balance and no URGENT orders; the avg comparison is "
    "exact integer math (cents*n > total_cents — a float average's last "
    "ulp is partial-agg-order-dependent and can flip boundary rows); "
    "scalar agg broadcast + left-anti join",
)
def q_tpch_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders = load(spark, sf_dir, "customer", "orders")
    cents = F.floor(F.col("c_acctbal") * 100 + 0.5).cast("long")
    bal = customer.filter(F.col("c_acctbal") > 0).agg(
        F.sum(cents).alias("total_cents"), F.count(F.lit(1)).alias("n")
    )
    rich = customer.join(F.broadcast(bal), cents * F.col("n") > F.col("total_cents"))
    idle = rich.join(
        orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey"),
        rich.c_custkey == F.col("o_custkey"),
        "left_anti",
    )
    return idle.groupBy((F.col("c_custkey") % 10).alias("code")).agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum(F.floor(F.col("c_acctbal") * 100 + 0.5).cast("long")).alias("totacctbal_cents"),
    )


@query(
    "tpch_q17_small_qty_revenue",
    oracle="""
    WITH pa AS (
      SELECT l_partkey, sum(l_quantity) AS sq, count(*) AS cq
      FROM lineitem GROUP BY l_partkey
    )
    SELECT p_brand,
           CAST(sum(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS small_qty_rev_cents,
           count(*) AS n_small_qty_items
    FROM lineitem
    JOIN pa USING (l_partkey)
    JOIN part ON p_partkey = l_partkey AND p_size < 15
    WHERE 5 * l_quantity * cq < sq
    GROUP BY p_brand
    """,
    doc="TPC-H Q17 shape: revenue from below-20%-of-part-average quantity "
    "line items — the correlated avg-per-part scalar subquery decorrelated "
    "into a pre-aggregated self-join; threshold compared in exact integer "
    "arithmetic (qty*5*cnt < sum) so no engine disagrees on the boundary",
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: ONE shuffle on l_partkey builds the per-part (sum, count)
    # aggregate; the fact-to-aggregate join reuses that key (AQE
    # co-partitions both sides), and `part` broadcasts.  The textbook
    # correlated form would re-scan lineitem per part — the decorrelated
    # join is the plan every warehouse rewrites Q17 into.
    li, part = load(spark, sf_dir, "lineitem", "part")
    pa = li.groupBy("l_partkey").agg(
        F.sum("l_quantity").alias("sq"), F.count(F.lit(1)).alias("cq")
    )
    small = li.join(pa, "l_partkey").filter(
        F.lit(5) * F.col("l_quantity") * F.col("cq") < F.col("sq")
    )
    dim = F.broadcast(part.filter(F.col("p_size") < 15).select("p_partkey", "p_brand"))
    cents = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint")
    return (
        small.join(dim, small.l_partkey == dim.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(cents).cast("bigint").alias("small_qty_rev_cents"),
            F.count(F.lit(1)).alias("n_small_qty_items"),
        )
    )


@query(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH eur AS (
      SELECT s_suppkey, s_name, s_acctbal
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ), lis AS (
      SELECT l_partkey, l_extendedprice, s_name, s_acctbal
      FROM lineitem JOIN eur ON l_suppkey = s_suppkey
    ), minp AS (
      SELECT l_partkey, min(l_extendedprice) AS mp FROM lis GROUP BY l_partkey
    )
    SELECT DISTINCT p_partkey AS part_key, p_brand, s_name,
           CAST(FLOOR(s_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_cents,
           CAST(FLOOR(mp * 100 + 0.5) AS BIGINT) AS min_price_cents
    FROM lis
    JOIN minp USING (l_partkey)
    JOIN part ON p_partkey = l_partkey
    WHERE l_extendedprice = mp
    """,
    doc="TPC-H Q2 shape (no partsupp table in this star — lineitem plays "
    "its role): for every part, the EUROPE supplier(s) offering its "
    "minimum observed price — min-per-group then join-back-on-equality, "
    "the distributed argmin that keeps ALL ties deterministically",
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: region/nation/supplier collapse into one broadcast dim before
    # the fact scan; the argmin is one shuffle on l_partkey for the min plus
    # a same-key join-back (AQE co-partitions).  min_by/max_by would save
    # the join but picks an arbitrary tie — the equality join-back is the
    # deterministic form.  Price equality is safe: both sides compare the
    # SAME untouched double from the scan, no arithmetic before the compare.
    li, supp, nat, reg, part = load(
        spark, sf_dir, "lineitem", "supplier", "nation", "region", "part"
    )
    eur = (
        supp.join(nat, supp.s_nationkey == nat.n_nationkey)
        .join(reg.filter(F.col("r_name") == "EUROPE"), nat.n_regionkey == reg.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal")
    )
    lis = li.join(F.broadcast(eur), li.l_suppkey == eur.s_suppkey).select(
        "l_partkey", "l_extendedprice", "s_name", "s_acctbal"
    )
    minp = lis.groupBy("l_partkey").agg(F.min("l_extendedprice").alias("mp"))
    pdim = F.broadcast(part.select("p_partkey", "p_brand"))
    return (
        lis.join(minp, "l_partkey")
        .filter(F.col("l_extendedprice") == F.col("mp"))
        .join(pdim, F.col("l_partkey") == F.col("p_partkey"))
        .select(
            F.col("p_partkey").alias("part_key"),
            "p_brand",
            "s_name",
            F.floor(F.col("s_acctbal") * 100 + 0.5).cast("bigint").alias("acctbal_cents"),
            F.floor(F.col("mp") * 100 + 0.5).cast("bigint").alias("min_price_cents"),
        )
        .distinct()
    )


@query(
    "tpch_q19_disjunctive_join",
    oracle="""
    SELECT p_brand,
           CAST(sum(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                         AS BIGINT)) AS BIGINT) AS revenue_cents,
           count(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    GROUP BY p_brand
    """,
    doc="TPC-H Q19 shape: disjunctive (OR-of-ANDs) join predicate mixing "
    "build-side and probe-side columns — the optimizer stress test where a "
    "naive plan degenerates to a cartesian filter; here the equi key joins "
    "and the disjunction evaluates post-join inside codegen",
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: the p_partkey = l_partkey conjunct is common to every branch,
    # so Catalyst keeps a broadcast HASH join on it and evaluates the OR as
    # a join-condition residual — never a BroadcastNestedLoop.  The
    # single-side conjuncts (p_size lower bound, l_quantity range) are also
    # derivable per-branch; p_size's common `>= 1` prefix pushes to the dim
    # scan.  Plan-asserted: BroadcastHashJoin, no cartesian.
    li, part = load(spark, sf_dir, "lineitem", "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    branch = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    cents = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5).cast("bigint")
    return (
        j.filter(branch)
        .groupBy("p_brand")
        .agg(
            F.sum(cents).cast("bigint").alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "tpch_q6_revenue_delta",
    oracle="""
    SELECT CAST(sum(CAST(FLOOR(l_extendedprice * l_discount * 100 + 0.5)
                         AS BIGINT)) AS BIGINT) AS revenue_delta_cents,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: single-table forecasting aggregate — every "
    "predicate pushes to the parquet scan, zero joins, one partial+final "
    "aggregation pair; the canonical scan-bound query",
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: ALL three filters reach PushedFilters (shipdate range,
    # discount range, quantity bound), so at 100 TB row-group statistics
    # prune most of the scan before a single row decodes; the aggregate
    # ships one partial row per task.
    (li,) = load(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * F.col("l_discount") * 100 + 0.5).cast("bigint")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(cents).cast("bigint").alias("revenue_delta_cents"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "tpch_q4_priority_check",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: order-priority checking — date-range scan + "
    "correlated EXISTS (left-semi join with a cross-side residual "
    "predicate) + tiny aggregation.  Adapted: TESTDATA carries no "
    "commit/receipt dates, so 'late' = any line shipped >60 days after "
    "the order date (same semi-join-with-residual plan shape)",
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: the EXISTS is a LEFT SEMI shuffle join on l_orderkey — the
    # equi component drives partitioning, the ship-lag comparison rides as
    # a join-condition residual; the order date range pushes to the orders
    # scan, pruning the build side before the shuffle.
    orders, li = load(spark, sf_dir, "orders", "lineitem")
    o = orders.filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    cond = (F.col("l.l_orderkey") == F.col("o.o_orderkey")) & (
        F.col("l.l_shipdate") > F.col("o.o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.alias("o")
        .join(li.alias("l"), cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "tpch_q10_returned_revenue",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(FLOOR(c.c_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_cents,
           CAST(sum(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                         AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1995-10-01'
      AND o.o_orderdate < TIMESTAMP '1996-01-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name, acctbal_cents
    ORDER BY revenue_cents DESC, c.c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: returned-item revenue ranking — fact-to-fact "
    "equi join chain + broadcast dims + top-20 by revenue (deterministic "
    "custkey tie-break)",
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: lineitem('R' rows) ⋈ orders(one quarter) shuffle on the
    # orderkey — both sides pre-filtered at their scans; customer joins on
    # the aggregated (≤|customers in window|) result; nation broadcasts.
    # The final top-20 is TakeOrderedAndProject, never a global sort.
    customer, orders, li, nation = load(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    o = orders.filter(
        (F.col("o_orderdate") >= "1995-10-01") & (F.col("o_orderdate") < "1996-01-01")
    )
    cents = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5).cast("bigint")
    rev = (
        li.filter(F.col("l_returnflag") == "R")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum(cents).cast("bigint").alias("revenue_cents"))
    )
    return (
        rev.join(customer, rev.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            F.floor(F.col("c_acctbal") * 100 + 0.5).cast("bigint").alias("acctbal_cents"),
            "revenue_cents",
        )
        .orderBy(F.col("revenue_cents").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "tpch_q14_promo_share",
    oracle="""
    WITH r AS (
      SELECT CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) AS cents,
             p_type LIKE 'PROMO%' AS is_promo
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01'
    )
    SELECT CAST(sum(CASE WHEN is_promo THEN cents ELSE 0 END) AS BIGINT) AS promo_revenue_cents,
           CAST(sum(cents) AS BIGINT) AS total_revenue_cents,
           CAST(FLOOR(sum(CASE WHEN is_promo THEN cents ELSE 0 END) * 10000.0
                      / sum(cents)) AS BIGINT) AS promo_share_bp
    FROM r
    """,
    doc="TPC-H Q14 shape: promotion revenue share — one-month scan, "
    "broadcast part dim, conditional aggregation, integer basis-point "
    "ratio (exact-double floor, engine-portable)",
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: the month filter pushes to the lineitem scan; part broadcasts;
    # one partial+final aggregate pair — no shuffle of fact rows at all.
    # Integer-cents sums < 2^53 keep the 10000.0 ratio double exact, so the
    # basis-point floor is identical on any engine.
    li, part = load(spark, sf_dir, "lineitem", "part")
    j = (
        li.filter((F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    )
    cents = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5).cast("bigint")
    promo = F.sum(F.when(F.col("p_type").like("PROMO%"), cents).otherwise(F.lit(0))).cast("bigint")
    total = F.sum(cents).cast("bigint")
    return j.agg(
        promo.alias("promo_revenue_cents"),
        total.alias("total_revenue_cents"),
        F.floor(promo * 10000.0 / total).cast("bigint").alias("promo_share_bp"),
    )


@query(
    "tpch_q9_product_profit",
    oracle="""
    SELECT n_name AS nation,
           year(o_orderdate) AS o_year,
           CAST(sum(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)
                    - CAST(FLOOR(p_retailprice * l_quantity * 50 + 0.5) AS BIGINT))
                AS BIGINT) AS profit_cents
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN part     ON p_partkey = l_partkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, year(o_orderdate)
    """,
    doc="TPC-H Q9 shape: product-type profit by supplier nation and order "
    "year — the 5-table join tree (no partsupp in this star: unit cost is "
    "proxied as half of p_retailprice, keeping the revenue-minus-cost "
    "measure); per-row integer-cents arithmetic makes the profit exact",
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: the only fact-sized shuffle is lineitem⋈orders on the orderkey
    # (both sides AQE-co-partitioned); supplier, nation, and the name-
    # filtered part dim all broadcast, so the 5-way tree costs ONE fact
    # shuffle + three map-side hash joins.  The p_name filter prunes part
    # before broadcast (predicate reaches the dim scan).
    li, orders, supp, nat, part = load(
        spark, sf_dir, "lineitem", "orders", "supplier", "nation", "part"
    )
    j = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(
            F.broadcast(part.filter(F.col("p_name").like("%red%"))),
            F.col("p_partkey") == F.col("l_partkey"),
        )
    )
    revenue = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5).cast("bigint")
    cost = F.floor(F.col("p_retailprice") * F.col("l_quantity") * 50 + 0.5).cast("bigint")
    return (
        j.groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(revenue - cost).cast("bigint").alias("profit_cents"))
    )


@query(
    "tpch_q11_important_stock",
    oracle="""
    WITH val AS (
      SELECT l_partkey,
             CAST(sum(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON n_nationkey = s_nationkey
      WHERE n_name = 'NATION_7'
      GROUP BY l_partkey
    )
    SELECT l_partkey AS part_key, value_cents
    FROM val
    WHERE value_cents > (SELECT CAST(FLOOR(sum(value_cents) * 0.001) AS BIGINT) FROM val)
    """,
    doc="TPC-H Q11 shape: important stock — per-part inventory value for "
    "one nation's suppliers, kept only above a fraction of the GLOBAL "
    "total (scalar-subquery threshold; lineitem plays partsupp's role in "
    "this star)",
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: one fact shuffle on l_partkey after the broadcast nation-
    # filtered supplier join; the global total is a second aggregation of
    # the ALREADY-AGGREGATED per-part values (|parts| rows, not fact rows)
    # broadcast back as a one-row threshold — the two-pass shape that
    # avoids any window-over-everything.
    li, supp, nat = load(spark, sf_dir, "lineitem", "supplier", "nation")
    nation7 = supp.join(
        F.broadcast(nat.filter(F.col("n_name") == "NATION_7")),
        F.col("n_nationkey") == F.col("s_nationkey"),
    ).select("s_suppkey")
    cents = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint")
    val = (
        li.join(F.broadcast(nation7), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(cents).cast("bigint").alias("value_cents"))
    )
    threshold = val.agg(
        F.floor(F.sum("value_cents") * 0.001).cast("bigint").alias("__thr")
    )
    return (
        val.join(F.broadcast(threshold))
        .filter(F.col("value_cents") > F.col("__thr"))
        .select(F.col("l_partkey").alias("part_key"), "value_cents")
    )


@query(
    "tpch_q12_late_priority",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate < TIMESTAMP '1996-01-01'
    GROUP BY l_returnflag
    """,
    doc="TPC-H Q12 shape: late shipments split by order priority class — "
    "cross-table date-arithmetic predicate (ship > order + 90 days) with "
    "conditional counting (this star has no l_shipmode/commitdate; "
    "l_returnflag plays the mode dimension)",
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: the one-year l_shipdate range pushes to the fact scan; the
    # join is the one fact shuffle (orderkey); the cross-side date
    # comparison is a join residual inside codegen; the CASE-sums are a
    # two-row aggregate.
    li, orders = load(spark, sf_dir, "lineitem", "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    j = (
        li.filter(
            (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1996-01-01")
        )
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
    )
    return j.groupBy("l_returnflag").agg(
        F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
        F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
    )


@query(
    "tpch_q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_size IN (1, 2, 3, 4, 5)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 shape: distinct suppliers per (brand, type, size) with a "
    "NOT-IN exclusion subquery (complaint suppliers := negative account "
    "balance in this star; lineitem is the part-supplier bridge)",
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: the size/brand filters prune the part dim BEFORE broadcast;
    # the exclusion list is a broadcast LEFT ANTI join (never a
    # NOT-IN-as-cartesian); count(DISTINCT) runs as the standard two-level
    # expand+agg on (brand, type, size) — all fact movement is one shuffle.
    li, part, supp = load(spark, sf_dir, "lineitem", "part", "supplier")
    dim = part.filter((F.col("p_brand") != "Brand#5") & F.col("p_size").isin(1, 2, 3, 4, 5))
    complaints = supp.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(dim), F.col("p_partkey") == F.col("l_partkey"))
        .join(
            F.broadcast(complaints),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).cast("bigint").alias("supplier_cnt"))
    )


@query(
    "tpch_q18_large_volume_customer",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, CAST(FLOOR(sum(l_quantity)) AS BIGINT) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
    )
    SELECT c_name, c_custkey, o_orderkey, o_orderdate,
           CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS total_price_cents,
           total_qty
    FROM big
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
    doc="TPC-H Q18 shape: large-volume customers — HAVING-filtered fact "
    "aggregation joined back to orders and customer",
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: aggregate lineitem FIRST (one fact shuffle on orderkey, with
    # map-side partial sums), so only the few hundred qualifying orderkeys
    # join onward; orders joins on the same key (AQE co-partition or
    # broadcast of the tiny big-side), customer broadcasts.
    li, orders, cust = load(spark, sf_dir, "lineitem", "orders", "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__q"))
        .filter(F.col("__q") > 300)
        .select("l_orderkey", F.floor("__q").cast("bigint").alias("total_qty"))
    )
    return (
        big.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("total_price_cents"),
            "total_qty",
        )
    )


@query(
    "tpch_q20_promotion_suppliers",
    oracle="""
    WITH shipped AS (
      SELECT l_suppkey, CAST(FLOOR(sum(l_quantity)) AS BIGINT) AS blue_qty
      FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%blue%')
      GROUP BY l_suppkey
      HAVING sum(l_quantity) > 100
    )
    SELECT s_name,
           CAST(FLOOR(s_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_cents,
           blue_qty
    FROM shipped
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE n_name = 'NATION_3'
    """,
    doc="TPC-H Q20 shape: suppliers who moved significant volume of one "
    "part family in one nation — nested IN subquery (semi-join), "
    "HAVING-thresholded aggregation, dim join-back (availqty has no home "
    "in this star, so the shipped-quantity threshold plays its role)",
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: the part-name IN list is a broadcast LEFT SEMI join onto the
    # fact scan (no fact shuffle for the filter); the per-supplier agg is
    # the one shuffle; supplier and nation broadcast onto the tiny
    # HAVING-filtered survivor set.
    li, part, supp, nat = load(spark, sf_dir, "lineitem", "part", "supplier", "nation")
    blue = part.filter(F.col("p_name").like("%blue%")).select("p_partkey")
    shipped = (
        li.join(F.broadcast(blue), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("__q"))
        .filter(F.col("__q") > 100)
        .select("l_suppkey", F.floor("__q").cast("bigint").alias("blue_qty"))
    )
    return (
        shipped.join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(
            F.broadcast(nat.filter(F.col("n_name") == "NATION_3")),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .select(
            "s_name",
            F.floor(F.col("s_acctbal") * 100 + 0.5).cast("bigint").alias("acctbal_cents"),
            "blue_qty",
        )
    )


@query(
    "scd2_history_build",
    oracle="""
    WITH ch AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER w AS prev_type
      FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    starts AS (
      SELECT user_id, event_type, ts, event_id FROM ch
      WHERE prev_type IS NULL OR prev_type <> event_type
    ),
    iv AS (
      SELECT user_id, event_type, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
      FROM starts
    )
    SELECT user_id, event_type, valid_from, valid_to,
           valid_to IS NULL AS is_current
    FROM iv
    """,
    doc="SCD Type-2 history build: collapse each user's event-type change "
    "stream into validity intervals [valid_from, valid_to) — lag() marks "
    "change points (consecutive duplicates collapse into one interval), "
    "lead() closes each interval at the next change, the open interval "
    "is flagged current.  Two user-partitioned windows, one shuffle "
    "total; ties broken by event_id on both engines.  The dimension-"
    "table versioning shape every warehouse ingest needs",
)
def q_scd2_history_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    (events,) = load(spark, sf_dir, "events")
    ev = events.filter(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ch = ev.select(
        "user_id", "event_type", "ts", "event_id",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    starts = ch.filter(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    )
    w2 = W.partitionBy("user_id").orderBy("ts", "event_id")
    iv = starts.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
    )
    return iv.select(
        "user_id", "event_type", "valid_from", "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
    )


@query(
    "rfm_segmentation",
    oracle="""
    WITH o AS (
      SELECT * FROM orders WHERE o_totalprice IS NULL OR isfinite(o_totalprice)
    ),
    g AS (SELECT max(CAST(o_orderdate AS DATE)) AS gmax FROM o),
    m AS (
      SELECT o_custkey,
             date_diff('day', max(CAST(o_orderdate AS DATE)), (SELECT gmax FROM g))
               AS r_days,
             count(*) AS f_n,
             coalesce(CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT), 0)
               AS m_cents
      FROM o GROUP BY o_custkey
    ),
    melt AS (
      SELECT o_custkey, 'recency' AS metric, CAST(r_days AS DOUBLE) AS value FROM m
      UNION ALL SELECT o_custkey, 'frequency', CAST(f_n AS DOUBLE) FROM m
      UNION ALL SELECT o_custkey, 'monetary', CAST(m_cents AS DOUBLE) FROM m
    ),
    -- rank/count over non-NULL finite values ONLY, mirroring
    -- grouped_kth_select_multi's drop-before-selection rule (a NULL
    -- r_days from a NULL o_orderdate must not inflate n and shift the
    -- quartile index k = ceil(n*p) — ADVICE r14)
    n AS (SELECT metric, count(*) AS n FROM melt
          WHERE value IS NOT NULL AND isfinite(value) GROUP BY metric),
    r AS (
      SELECT metric, o_custkey, value,
             row_number() OVER (PARTITION BY metric ORDER BY value, o_custkey) AS rn
      FROM melt WHERE value IS NOT NULL AND isfinite(value)
    ),
    b AS (
      SELECT r.metric,
             max(CASE WHEN rn = GREATEST(1, CAST(ceil(n.n * 0.25) AS BIGINT))
                      THEN value END) AS q25,
             max(CASE WHEN rn = GREATEST(1, CAST(ceil(n.n * 0.50) AS BIGINT))
                      THEN value END) AS q50,
             max(CASE WHEN rn = GREATEST(1, CAST(ceil(n.n * 0.75) AS BIGINT))
                      THEN value END) AS q75
      FROM r JOIN n USING (metric) GROUP BY r.metric
    ),
    scored AS (
      SELECT melt.o_custkey, melt.metric,
             1 + CAST(melt.value > b.q25 AS INT)
               + CAST(melt.value > b.q50 AS INT)
               + CAST(melt.value > b.q75 AS INT) AS s
      FROM melt JOIN b USING (metric)
    ),
    sc AS (
      SELECT o_custkey,
             max(CASE WHEN metric = 'recency' THEN s END) AS r_score,
             max(CASE WHEN metric = 'frequency' THEN s END) AS f_score,
             max(CASE WHEN metric = 'monetary' THEN s END) AS m_score
      FROM scored GROUP BY o_custkey
    )
    SELECT m.o_custkey,
           CAST(m.r_days AS BIGINT) AS r_days,
           CAST(m.f_n AS BIGINT) AS f_n,
           m.m_cents,
           CAST(sc.r_score AS INT) AS r_score,
           CAST(sc.f_score AS INT) AS f_score,
           CAST(sc.m_score AS INT) AS m_score,
           CAST(sc.r_score * 100 + sc.f_score * 10 + sc.m_score AS INT) AS rfm_code
    FROM m JOIN sc USING (o_custkey)
    """,
    doc="RFM customer segmentation (recency/frequency/monetary quartile "
    "scores) the SCALE-CORRECT way: quartile BOUNDARIES come from the "
    "distributed two-level histogram selection (grouped_kth_select_multi "
    "over the melted 3-metric table — exact lower percentiles, no global "
    "ntile funnelling every customer through one partition), broadcast "
    "back, and each customer scores scan-locally by three comparisons; "
    "monetary is exact integer cents, recency exact day diffs",
)
def q_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from amazon_kinesis_data_analytics_flinktableapi_spark.functions.scalar import finite_or_null
    from amazon_kinesis_data_analytics_flinktableapi_spark.operators.ranking import (
        grouped_kth_select_multi,
    )

    (orders,) = load(spark, sf_dir, "orders")
    o = orders.filter(finite_or_null("o_totalprice"))
    gmax = o.agg(F.max(F.to_date("o_orderdate")).alias("gmax"))
    m = (
        o.groupBy("o_custkey")
        .agg(
            F.max(F.to_date("o_orderdate")).alias("last_order"),
            F.count(F.lit(1)).alias("f_n"),
            F.sum(F.floor(F.col("o_totalprice") * 100)).cast("long").alias("m_cents"),
        )
        .crossJoin(F.broadcast(gmax))
        .select(
            "o_custkey",
            F.datediff("gmax", "last_order").cast("long").alias("r_days"),
            "f_n",
            F.coalesce("m_cents", F.lit(0).cast("long")).alias("m_cents"),
        )
        # NOT cached, deliberately: the selection operator re-reads this
        # per level per percentile, so the 1-row gmax cross re-expands
        # into every branch — but the recompute is one orders groupBy,
        # and MEASURED caching costs more than it saves here (sf0.1→sf1
        # probe: 3.0→3.6 s uncached vs 3.6→5.1 s cached — cache
        # materialization exceeds the recompute).  At a scale where the
        # metric table is expensive, persist() it before this point.
    )
    melted = m.select(
        "o_custkey",
        F.explode(
            F.array(
                F.struct(
                    F.lit("recency").alias("metric"),
                    F.col("r_days").cast("double").alias("value"),
                ),
                F.struct(
                    F.lit("frequency").alias("metric"),
                    F.col("f_n").cast("double").alias("value"),
                ),
                F.struct(
                    F.lit("monetary").alias("metric"),
                    F.col("m_cents").cast("double").alias("value"),
                ),
            )
        ).alias("x"),
    ).select("o_custkey", "x.metric", "x.value")
    bounds = grouped_kth_select_multi(
        melted, ["metric"], value_col="value", id_col="o_custkey", ps=[0.25, 0.5, 0.75]
    )
    bpivot = bounds.groupBy("metric").agg(
        F.max(F.when(F.col("p") == 0.25, F.col("value"))).alias("q25"),
        F.max(F.when(F.col("p") == 0.50, F.col("value"))).alias("q50"),
        F.max(F.when(F.col("p") == 0.75, F.col("value"))).alias("q75"),
    )
    scored = melted.join(F.broadcast(bpivot), "metric").select(
        "o_custkey",
        "metric",
        (
            F.lit(1)
            + (F.col("value") > F.col("q25")).cast("int")
            + (F.col("value") > F.col("q50")).cast("int")
            + (F.col("value") > F.col("q75")).cast("int")
        ).alias("s"),
    )
    sc = scored.groupBy("o_custkey").agg(
        F.max(F.when(F.col("metric") == "recency", F.col("s"))).alias("r_score"),
        F.max(F.when(F.col("metric") == "frequency", F.col("s"))).alias("f_score"),
        F.max(F.when(F.col("metric") == "monetary", F.col("s"))).alias("m_score"),
    )
    return m.join(sc, "o_custkey").select(
        "o_custkey",
        "r_days",
        "f_n",
        "m_cents",
        F.col("r_score").cast("int").alias("r_score"),
        F.col("f_score").cast("int").alias("f_score"),
        F.col("m_score").cast("int").alias("m_score"),
        (F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score"))
        .cast("int")
        .alias("rfm_code"),
    )

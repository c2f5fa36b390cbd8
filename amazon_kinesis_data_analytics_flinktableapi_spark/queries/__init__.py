"""Oracle-checked query library (the driver contract, SURVEY.md §2).

Each :class:`QuerySpec` pairs a Spark implementation (DataFrame-native or
engine SQL) with the equivalent ANSI SQL that DuckDB runs on the same
parquet tables.  Column names/aliases are identical on both sides — the
driver's compare sorts columns by name before value-hashing.

``REGISTRY`` is the single source of truth consumed by ``__spark_entry__``
(driver), ``bench.py`` (headline set), and ``tests/test_oracle.py`` (local
sf0.001 replica of the driver's sf0.01 gate).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    #: DuckDB-runnable ANSI SQL over pre-registered views; None → the driver
    #: records a weaker rows-only check (non-SQL-expressible ops).
    oracle: str | None
    #: included in bench.py's headline timing set
    headline: bool = False
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(spec: QuerySpec) -> QuerySpec:
    if spec.name in REGISTRY:
        raise ValueError(f"duplicate query name: {spec.name}")
    REGISTRY[spec.name] = spec
    return spec


def query(name: str, oracle: str | None, headline: bool = False, doc: str = ""):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn):
        register(QuerySpec(name=name, fn=fn, oracle=oracle, headline=headline, doc=doc or fn.__doc__ or ""))
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, *tables: str) -> list[DataFrame]:
    """Read TESTDATA parquet tables and register them as temp views."""
    from amazon_kinesis_data_analytics_flinktableapi_spark.sources.batch import read_table

    out = []
    for t in tables:
        df = read_table(spark, sf_dir, t)
        df.createOrReplaceTempView(t)
        out.append(df)
    return out


# import side-effect: populate REGISTRY
from amazon_kinesis_data_analytics_flinktableapi_spark.queries import (  # noqa: E402,F401
    advanced,
    arrays_windows,
    extras,
    llm,
    pipeline_ops,
    reference,
    relational,
)

_ALL_MODULES = [reference, relational, llm, advanced, extras, arrays_windows, pipeline_ops]

# --- explicit registry ordering -------------------------------------------
# The driver's correctness gate records the FIRST 50 registered queries per
# round (CORRECTNESS_r01.json attested exactly registry positions 1-50, so
# round 1's alphabetical import order left the flagship reference queries and
# the whole relational surface unattested).  Order is therefore part of the
# driver contract: highest-value and recently-changed queries first, the
# previously-attested tail last (rotated back into the window in later
# rounds).
_PRIORITY: list[str] = [
    # the reference's literal workload (StreamingJob.java:91-101)
    "interval_join",
    "currency_conversion",
    "projection_filter",
    # SURVEY §2 core relational surface
    "agg_pricing_summary",
    "join_revenue_by_nation",
    "topk_orders",
    "window_rank",
    "window_moving_avg",
    "set_ops",
    "join_semi",
    "join_anti",
    "rollup_customer_geo",
    "large_order_customers",
    "nation_pair_revenue",
    "cube_status_priority",
    "unpivot_lineitem_metrics",
    "value_histogram",
    "grouped_having",
    "distinct_pairs",
    "tumbling_window_events",
    "sliding_window_events",
    "conditional_agg",
    "shipping_priority",
    "string_functions",
    "math_functions",
    "date_functions",
    # r1 driver failures, fixed in r2 — need fresh attestation
    "json_extract_agg",
    "pivot_status_by_priority",
    "session_gaps_islands",
    "approx_sketches",
    # changed in r2 (scale-path rewires) — need fresh attestation
    "neardup_jaccard",
    "embedding_neardup",
    "dedup_clusters",
    # previously outside the window
    "deterministic_sample",
    # new in r2 — need first attestation
    "asof_forward_join",
    "timeseries_interpolate",
    "grouping_sets_revenue",
    "tpch_q8_market_share",
    "salted_join_revenue",
    "media_frame_sample",
    "media_resize",
    "array_hof_pipeline",
    "regex_extract_tokens",
    "tpch_q21_late_supplier",
    "contamination_ngram_overlap",
    "repetition_signals",
    "embedding_quantize_int8",
    # streaming flagships (S4/S5/K3 attestations ride on these; the four
    # r1-attested-green streaming window/stateful queries rotated out to
    # make room for the new queries above — they re-enter a later round)
    "streaming_interval_join",
    "streaming_sliding_window",
    "streaming_dedup",
]


def _reorder_registry() -> None:
    missing = [n for n in _PRIORITY if n not in REGISTRY]
    if missing:
        raise ValueError(f"_PRIORITY names not registered: {missing}")
    rest = [n for n in REGISTRY if n not in set(_PRIORITY)]
    ordered = {n: REGISTRY[n] for n in [*_PRIORITY, *rest]}
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder_registry()


def all_specs() -> dict[str, QuerySpec]:
    return dict(REGISTRY)

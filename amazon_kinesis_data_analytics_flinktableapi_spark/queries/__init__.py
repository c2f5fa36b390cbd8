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
    # --- round 3 window -----------------------------------------------------
    # 1-25: the 25 queries with NO driver row in r1 or r2 (VERDICT r2
    # "What's missing" #1) — first-ever attestation.
    "tpch_q2_min_cost_supplier",
    "tpch_q13_custdist",
    "tpch_q15_top_supplier",
    "tpch_q17_small_qty_revenue",
    "tpch_q19_disjunctive_join",
    "tpch_q22_idle_customers",
    "table_profile",
    "integrity_audit",
    "window_running_distinct",
    "robust_stats_mad",
    "merge_upsert_snapshot",
    "global_sort_index",
    "sequence_packing",
    "vocab_oov_rate",
    "pii_redaction",
    "embedding_label_centroids",
    "boilerplate_chunk_removal",
    "tfidf_top_terms",
    "topp_cumulative_share",
    "try_arithmetic",
    "map_functions",
    "cogroup_asof_pandas",
    "zorder_layout",
    "streaming_topk_complete",
    "streaming_chained_windows",
    # 26-33: changed in r3 — convergence/count-action rewires, oracle-parity
    # fixes, and the approximate ops upgraded from rows-only to deterministic
    # hash-checkable oracles.
    "dedup_clusters",
    "neardup_jaccard",
    "embedding_quantize_int8",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "streaming_late_data",
    # 34-50: r1-attested-only tail rotated back in (streaming stateful ops
    # first — they rode out of the window in r2).
    "streaming_tumbling_window",
    "streaming_session_window",
    "streaming_running_aggregate",
    "streaming_static_enrich",
    "dedup_exact",
    "dedup_fingerprint",
    "ann_cosine_topk",
    "edit_distance_verify",
    "stat_aggregates",
    "correlated_subquery",
    "rank_family",
    "window_value_family",
    "range_frame_window",
    "pandas_grouped_zscore",
    "pandas_udaf_weighted_avg",
    "python_udtf_bigrams",
    "asof_join_latest_rate",
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

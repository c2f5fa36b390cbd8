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
    mining,
    pipeline_ops,
    reference,
    relational,
)

_ALL_MODULES = [reference, relational, llm, advanced, extras, arrays_windows, pipeline_ops, mining]

# --- explicit registry ordering -------------------------------------------
# The driver's correctness gate records the FIRST 50 registered queries per
# round (CORRECTNESS_r01.json attested exactly registry positions 1-50, so
# round 1's alphabetical import order left the flagship reference queries and
# the whole relational surface unattested).  Order is therefore part of the
# driver contract: highest-value and recently-changed queries first, the
# previously-attested tail last (rotated back into the window in later
# rounds).
_PRIORITY: list[str] = [
    # --- round 8 window -----------------------------------------------------
    # 1-2: the ONLY two queries never to have held a driver slot (VERDICT r7
    # #1; judge replica-green twice) — with these green, every registered
    # query has ≥1 green driver row.  3-4: the surfaces changed this round —
    # kinesis_translating_sdk_roundtrip is NEW (the ordinal↔opaque-sequence
    # adapter stack, VERDICT r7 #4) and kinesis_fake_sdk_roundtrip rides the
    # sdk_read_range gap-page fix.  5-50: staleness rotation, oldest green
    # row first — the full r2-attested block (8, incl. the rows-only
    # approx_sketches), the full r4-attested block (36), then two r5-stale
    # bench headliners.  Next-stalest (r5 block) leads the r9 rotation.
    "tpch_q16_supplier_part_counts",
    "tpch_q20_promotion_suppliers",
    "kinesis_translating_sdk_roundtrip",
    "kinesis_fake_sdk_roundtrip",
    "json_extract_agg",
    "pivot_status_by_priority",
    "approx_sketches",
    "set_ops",
    "join_semi",
    "join_anti",
    "string_functions",
    "math_functions",
    "stat_aggregates",
    "correlated_subquery",
    "pandas_grouped_zscore",
    "pandas_udaf_weighted_avg",
    "python_udtf_bigrams",
    "range_frame_window",
    "robust_stats_mad",
    "rank_family",
    "window_value_family",
    "window_running_distinct",
    "cogroup_asof_pandas",
    "table_profile",
    "integrity_audit",
    "dedup_exact",
    "dedup_fingerprint",
    "ann_cosine_topk",
    "edit_distance_verify",
    "tfidf_top_terms",
    "vocab_oov_rate",
    "embedding_quantize_int8",
    "embedding_label_centroids",
    "pii_redaction",
    "boilerplate_chunk_removal",
    "sequence_packing",
    "zorder_layout",
    "tpch_q15_top_supplier",
    "topp_cumulative_share",
    "global_sort_index",
    "merge_upsert_snapshot",
    "map_functions",
    "try_arithmetic",
    "tpch_q13_custdist",
    "tpch_q22_idle_customers",
    "tpch_q17_small_qty_revenue",
    "tpch_q2_min_cost_supplier",
    "tpch_q19_disjunctive_join",
    "neardup_jaccard",
    "dedup_clusters",
    # --- round 7 window (attested r7; rotates behind) ------------------------
    # VERDICT r6 #1: 50 registered queries have never held a driver window
    # slot (judge replica-verified all oracle-bearing ones green, but
    # unattested code rots).  The r7 window is therefore the entire
    # never-attested backlog, ordered: (a) surfaces CHANGED this round
    # first (seasonal_residual_flags' 3σ test moved to DECIMAL(38)/HUGEINT,
    # event_transition_matrix touched), plus new r7 queries as they land;
    # (b) the mining/sketch/stats tier and interval_join_full; (c) the five
    # TPC-H never-attested shapes LAST — they are plan-shape twins of
    # already-attested shapes, so they are the lowest-risk entries to slip
    # into the r8 window if new r7 queries displace the tail.
    "embedding_neardup_wide",       # NEW r7: second LSH shape (16 tables × 8 planes)
    "seasonal_residual_flags",      # changed r7: overflow-proof decimal 3σ test
    "event_transition_matrix",      # changed r7 (dead local removed)
    "incremental_dedup",            # bench headliner, never windowed
    "embedding_gram_matrix",        # bench headliner, never windowed
    "interval_join_full",           # reference-adjacent: full-outer interval join
    "streaming_incremental_dedup",
    "streaming_cms_sketch",
    "streaming_sequence_detect",
    "streaming_gram_matrix",
    "cms_frequency_sketch",
    "kmv_set_ops",
    "binned_quantile_estimate",
    "minhash_accuracy_report",
    "ann_recall_report",
    "bloom_contamination_screen",
    "dedup_pipeline_report",
    "canonical_doc_select",
    "template_doc_detect",
    "split_leakage_audit",
    "token_budget_select",
    "snapshot_cdc_diff",
    "incremental_agg_merge",
    "feature_hash_vector",
    "weighted_sample_topk",
    "char_entropy_score",
    "bpe_merge_step",
    "bigram_surprisal_score",
    "pmi_collocations",
    "pca_power_iteration",
    "pca_outlier_scores",
    "embedding_dim_variance",
    "triangle_count_graph",
    "pagerank_dup_graph",
    "link_prediction_common_neighbors",
    "attribution_last_touch",
    "cohort_retention",
    "recursive_ewma_rates",
    "theilsen_trend",
    "cusum_changepoint",
    "rolling_anomaly_flags",
    "winsorize_outliers",
    "chisq_priority_status",
    "join_key_skew_report",
    "variant_semistructured",
    "xml_roundtrip_extract",
    "tpch_q11_important_stock",     # BNLJ-whitelisted shape — worth a driver row
    "tpch_q18_large_volume_customer",
    "tpch_q12_late_priority",
    # --- round 6 window (attested r6; rotate behind the backlog) ------------
    # 1-9: changed surfaces.  kinesis_interval_join /
    # streaming_kinesis_tumbling drive the reference topology end-to-end
    # through the in-repo format("kinesis_sim") connector, batch and
    # streaming read paths respectively (first driver attestations);
    # interval_join_forward attests the forward branch of the bucket
    # algebra; embedding_neardup was rewritten twice (Arrow matmul
    # sketches, then the flat-column exact verify); 5 streaming queries
    # represent the replay fixture writer that became distributed this
    # round (one code path shared by all 11 riders — the other 6, all
    # green r5 with unchanged operator code, yield their slots to
    # never-attested queries and lead the r7 rotation).
    "kinesis_interval_join",
    "streaming_kinesis_tumbling",
    "interval_join_forward",
    "embedding_neardup",
    "streaming_interval_join",
    "streaming_tumbling_window",
    "streaming_late_data",
    "streaming_dedup",
    "streaming_asof_enrich",
    # 10-20: new this round, never driver-attested — window policy rule 3
    # (new queries enter on their first round): the sink-side kinesis
    # attestation, the substring-dedup tier (detect + remove), DSIR
    # selection, containment pairs, within-watermark streaming dedup,
    # split assignment, three pipeline ops, and one representative of the
    # six new TPC-H shapes (plan-shape twins of attested shapes; r7
    # rotates the rest).
    "streaming_kinesis_roundtrip",
    "duplicate_span_detect",
    "duplicate_span_removal",
    "dsir_importance_select",
    "containment_neardup",
    "streaming_dedup_restamped",
    "dataset_split_assign",
    "semantic_dedup",
    "domain_mixture_sample",
    "unigram_surprisal_score",
    "tpch_q9_product_profit",
    # 21-50: staleness rotation (VERDICT r5 #1): queries whose newest
    # green driver row was ≤ r2, oldest first — r1 block first, then the
    # r2 tail.  30 of the 37 fit (≥30 asked); the slots the never-attested
    # round-6 additions above took came from the lowest-rot-risk stale
    # surfaces (string/math functions, set_ops, semi/anti join,
    # json_extract_agg, pivot_status_by_priority — pure relational ops
    # with no timestamp/env coupling), which lead the r7 rotation.
    "doc_chunks",
    "normalize_text",
    "rolling_fingerprint",
    "stratified_sample",
    "reservoir_per_group",
    "deterministic_sample",
    "agg_pricing_summary",
    "join_revenue_by_nation",
    "topk_orders",
    "window_rank",
    "window_moving_avg",
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
    "date_functions",
    "grouping_sets_revenue",
    "tpch_q8_market_share",
    "salted_join_revenue",
    "regex_extract_tokens",
    "tpch_q21_late_supplier",
    "repetition_signals",
]


def _reorder_registry() -> None:
    missing = [n for n in _PRIORITY if n not in REGISTRY]
    if missing:
        raise ValueError(f"_PRIORITY names not registered: {missing}")
    dupes = [n for n in set(_PRIORITY) if _PRIORITY.count(n) > 1]
    if dupes:
        # duplicates would make raw list indices diverge from effective
        # registry positions — the window accounting (VERDICT/COVERAGE
        # cite "_PRIORITY position N") silently goes wrong
        raise ValueError(f"_PRIORITY names duplicated: {sorted(dupes)}")
    rest = [n for n in REGISTRY if n not in set(_PRIORITY)]
    ordered = {n: REGISTRY[n] for n in [*_PRIORITY, *rest]}
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder_registry()


def all_specs() -> dict[str, QuerySpec]:
    return dict(REGISTRY)

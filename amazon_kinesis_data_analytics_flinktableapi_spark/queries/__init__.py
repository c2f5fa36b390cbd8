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
    # --- round 5 window -----------------------------------------------------
    # 1-15: everything repaired or changed this round.  1-11 sat in the
    # round-4 blast radius of the TIMESTAMP_NTZ environment shift (flagship
    # interval join + as-of joins crashed; replay wire format NULLed every
    # event time, zeroing the streaming windows) — the fix lives at the
    # source boundary (sources/batch.normalize_timestamps) and these rows
    # re-attest it in the driver's environment.  12-15 were rows-only
    # (oracle=None) for four straight rounds; this round rebuilt them on
    # portable md5-derived hashes / integer-quantized sketches so the
    # driver hash-checks the approximate results themselves.
    "interval_join",
    "currency_conversion",
    "projection_filter",
    "asof_join_latest_rate",
    "asof_forward_join",
    "streaming_interval_join",
    "streaming_tumbling_window",
    "streaming_session_window",
    "streaming_late_data",
    "streaming_chained_windows",
    "streaming_running_aggregate",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_lsh_topk",
    "ann_ivf_topk",
    # 16-25: adjacent surfaces touched this round — bench-headline
    # additions (dedup_clusters, embedding_neardup), the max_df-validated
    # jaccard path, the remaining replay-path streaming ops, and the
    # capability-probed media decoders.
    "dedup_clusters",
    "embedding_neardup",
    "neardup_jaccard",
    "streaming_static_enrich",
    "streaming_sliding_window",
    "streaming_dedup",
    "streaming_topk_complete",
    "media_decode_meta",
    "media_frame_sample",
    "media_resize",
    # 26-30: brand-new this round (first-ever attestation): TPC-H Q4/Q6/
    # Q10/Q14 shapes + the deterministic KMV distinct sketch.
    "tpch_q4_priority_check",
    "tpch_q6_revenue_delta",
    "tpch_q10_returned_revenue",
    "tpch_q14_promo_share",
    "kmv_distinct_sketch",
    "streaming_asof_enrich",
    # 32-50: staleness rotation — queries whose newest driver row is r2
    # (the r3/r4 windows excluded them); r4 proved attestation rot is real,
    # so the tail cycles back in oldest-first.  (json_extract_agg and
    # pivot_status_by_priority yield their slots to the new queries this
    # round — simple, low-rot-risk surfaces.)
    "array_agg_sorted",
    "set_intersect",
    "self_range_join",
    "null_scalars",
    "array_hof_pipeline",
    "timeseries_interpolate",
    "lag_lead_gaps",
    "explode_token_frequencies",
    "event_sequence_detect",
    "funnel_steps",
    "timeseries_gap_fill",
    "session_gaps_islands",
    "cascaded_rollup",
    "token_stats",
    "bpe_token_estimate",
    "quality_score",
    "lang_id",
    "corpus_clean_pipeline",
    "contamination_ngram_overlap",
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

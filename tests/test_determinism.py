"""Partitioning-invariance contracts: the engine's determinism story is
integer quantization (micro-units, millibits, truncating divides), which
claims the RESULT cannot depend on how work is partitioned.  The oracle
gate proves cross-ENGINE equality at one partitioning; this suite proves
cross-PARTITIONING equality inside Spark — the property that makes results
reproducible when a cluster resizes, AQE re-plans, or a retry lands on a
different executor count.
"""

from __future__ import annotations

import pytest

from amazon_kinesis_data_analytics_flinktableapi_spark.queries import REGISTRY
from tests.conftest import SF_SMOKE

#: queries whose docstrings promise partition-independent exact results —
#: one representative per determinism mechanism.
INVARIANT_QUERIES = [
    "embedding_gram_matrix",     # int64 numpy partials, monoid merge
    "pca_power_iteration",       # iterative trajectory in integer quanta
    "pagerank_dup_graph",        # iterative fixpoint, integer div damping
    "unigram_surprisal_score",   # quantize-then-sum millibits
    "pmi_collocations",          # signed sum of floored millibit terms
    "kmv_distinct_sketch",       # order-statistic sketch on portable hash
    "incremental_agg_merge",     # integer-cents partial-agg algebra
    "binned_quantile_estimate",  # mergeable bin counts, integer rank crossings
    "cms_frequency_sketch",      # cell-wise-mergeable integer grid
    "theilsen_trend",            # rank-filter median with deterministic ties
]


@pytest.mark.parametrize("name", INVARIANT_QUERIES)
def test_result_invariant_under_partitioning(spark, name):
    original = spark.conf.get("spark.sql.shuffle.partitions")
    rows = {}
    try:
        for n_part in ("3", "7"):
            spark.conf.set("spark.sql.shuffle.partitions", n_part)
            spark.catalog.clearCache()  # caches pin the old partitioning
            df = REGISTRY[name].fn(spark, SF_SMOKE)
            rows[n_part] = sorted(tuple(r) for r in df.collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", original)
        spark.catalog.clearCache()
    assert rows["3"] == rows["7"], (
        f"{name}: result depends on shuffle partitioning "
        f"({len(rows['3'])} vs {len(rows['7'])} rows)"
    )

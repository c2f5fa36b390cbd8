"""Physical-plan inspection and assertions.

The 100 TB contract for every operator in this engine is a *plan shape*,
not a wall-clock number: filters reach the parquet scan, projections prune
the read schema, small dims broadcast, top-k never globally sorts, joins
are equi (never cartesian).  These helpers make that contract testable —
tests/test_plans.py pins the shape of each headline query so a regression
in Catalyst usage (a lost pushdown, an accidental cross join) fails CI
long before it would melt a cluster.
"""

from amazon_kinesis_data_analytics_flinktableapi_spark.plans.inspect import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filters,
    assert_read_schema_pruned,
    assert_take_ordered,
    explain_str,
)

__all__ = [
    "assert_broadcast_join",
    "assert_no_cartesian",
    "assert_pushed_filters",
    "assert_read_schema_pruned",
    "assert_take_ordered",
    "explain_str",
]

"""Physical-plan string inspection (see package docstring)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The .explain() output as a string."""
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Every fragment must appear in a PushedFilters clause of the scan —
    i.e. the predicate reached the parquet reader, not just a Filter node."""
    plan = explain_str(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    joined = "\n".join(pushed)
    for frag in fragments:
        assert frag in joined, f"filter {frag!r} not pushed to scan.\nPushedFilters lines:\n{joined}\nplan:\n{plan}"


def assert_read_schema_pruned(df: DataFrame, table_fragment: str, max_columns: int) -> None:
    """The scan's ReadSchema must carry at most ``max_columns`` columns —
    column pruning reached the reader."""
    plan = explain_str(df)
    for ln in plan.splitlines():
        if "ReadSchema" in ln and table_fragment in plan:
            schema_part = ln.split("ReadSchema:", 1)[1]
            ncols = schema_part.count(":")
            assert ncols <= max_columns, f"scan reads {ncols} columns (> {max_columns}): {ln}"
            return
    raise AssertionError(f"no ReadSchema line found in plan:\n{plan}")


def assert_broadcast_join(df: DataFrame, min_count: int = 1) -> None:
    plan = explain_str(df)
    n = plan.count("BroadcastHashJoin")
    assert n >= min_count, f"expected ≥{min_count} BroadcastHashJoin, found {n}:\n{plan}"


def assert_no_cartesian(df: DataFrame) -> None:
    plan = explain_str(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, (
        f"plan contains a cartesian/nested-loop join:\n{plan}"
    )


def assert_take_ordered(df: DataFrame) -> None:
    """Top-k must compile to TakeOrderedAndProject (per-partition top-k +
    merge), never a global Sort + Limit."""
    plan = explain_str(df)
    assert "TakeOrderedAndProject" in plan, f"no TakeOrderedAndProject in plan:\n{plan}"

"""waterfill_allocation pins: hand-computed levels for every branch
(all-fit, squeeze, sub-floor budget, zero budget) plus a hypothesis
property test against the brute-force definition — t is the LARGEST
integer with sum(min(c, t)) <= budget, capped at max(c)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from amazon_kinesis_data_analytics_flinktableapi_spark.operators.ranking import (
    waterfill_allocation,
)


def _run(spark, counts, budget):
    df = spark.createDataFrame(
        [(k, int(c)) for k, c in counts], "source string, token_count long"
    )
    rows = waterfill_allocation(df, ["source"], "token_count", budget=budget).collect()
    return (
        {r["source"]: (r["token_count"], r["alloc_tokens"]) for r in rows},
        {r["water_level"] for r in rows},
    )


def _brute_level(cs, budget):
    """max integer t with sum(min(c, t)) <= budget, capped at max(c)."""
    t = 0
    while t < max(cs) and sum(min(c, t + 1) for c in cs) <= budget:
        t += 1
    return t


def test_waterfill_squeeze_branch(spark):
    # counts 10, 20, 70; budget 60 -> t=25: 10+20+25=55<=60, t=26 -> 56...
    # brute: t climbs while total fits; verify against the definition
    counts = [("a", 10), ("b", 20), ("c", 70)]
    t = _brute_level([10, 20, 70], 60)
    alloc, levels = _run(spark, counts, 60)
    assert levels == {t}
    assert alloc == {"a": (10, min(10, t)), "b": (20, min(20, t)), "c": (70, min(70, t))}
    assert sum(a for _, a in alloc.values()) <= 60


def test_waterfill_all_fit(spark):
    alloc, levels = _run(spark, [("a", 5), ("b", 9)], 100)
    assert levels == {9}  # capped at max count — everything allocated
    assert alloc == {"a": (5, 5), "b": (9, 9)}


def test_waterfill_budget_below_uniform_floor(spark):
    # budget 7 over 3 sources -> t = floor(7/3) = 2 (below every count)
    alloc, levels = _run(spark, [("a", 10), ("b", 10), ("c", 10)], 7)
    assert levels == {2}
    assert alloc == {"a": (10, 2), "b": (10, 2), "c": (10, 2)}


def test_waterfill_zero_budget_and_validation(spark):
    alloc, levels = _run(spark, [("a", 3)], 0)
    assert levels == {0} and alloc == {"a": (3, 0)}
    df = spark.createDataFrame([("a", 1)], "source string, token_count long")
    with pytest.raises(ValueError, match="budget"):
        waterfill_allocation(df, ["source"], "token_count", budget=-1)


@settings(max_examples=15, deadline=None)
@given(
    counts=st.lists(st.integers(0, 50), min_size=1, max_size=8),
    budget=st.integers(0, 300),
)
def test_waterfill_matches_brute_force(spark, counts, budget):
    named = [(f"s{i}", c) for i, c in enumerate(counts)]
    t = _brute_level(counts, budget)
    alloc, levels = _run(spark, named, budget)
    assert levels == {t}, (counts, budget)
    for i, c in enumerate(counts):
        assert alloc[f"s{i}"] == (c, min(c, t)), (counts, budget, t)
    # maximality: the allocation fills the budget as far as the level allows
    total = sum(a for _, a in alloc.values())
    assert total <= budget or t == max(counts)

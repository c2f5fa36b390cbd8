"""Property test: the PPJoin prefix filter is LOSSLESS at the threshold.

``prefix_filter_setjoin``'s oracle (the unpruned inverted index) already
certifies losslessness on the fixtures; this test drives the same
algorithm over RANDOM small corpora and compares against a brute-force
all-pairs Jaccard in pure Python — so the theorem is exercised on set
shapes the fixtures never produce (singleton sets, disjoint vocabulary
islands, all-identical docs, sets straddling the length-filter
boundary).
"""

from __future__ import annotations

import itertools
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

TAU = 0.6

#: tiny vocabulary ON PURPOSE: maximal overlap pressure, the worst case
#: for candidate pruning
_VOCAB = [f"t{i}" for i in range(12)]

corpora = st.lists(
    st.sets(st.sampled_from(_VOCAB), min_size=0, max_size=8),
    min_size=2,
    max_size=12,
)


def _brute_pairs(sets: dict[int, frozenset]) -> set[tuple[int, int, float]]:
    out = set()
    for a, b in itertools.combinations(sorted(sets), 2):
        sa, sb = sets[a], sets[b]
        union = len(sa | sb)
        if union == 0:
            continue
        j = len(sa & sb) / union
        if j >= TAU:
            out.add((a, b, round(j, 9)))
    return out


def _prefix_filter_pairs(sets: dict[int, frozenset]) -> set[tuple[int, int, float]]:
    """The algorithm under test, pure-Python mirror of the Spark plan:
    rarest-first canonical order, prefix length n - ceil(tau*n) + 1,
    length filter, exact verify on candidates only."""
    df: dict[str, int] = {}
    for s in sets.values():
        for t in s:
            df[t] = df.get(t, 0) + 1
    order = lambda t: (df[t], t)  # noqa: E731
    prefix_of: dict[int, list[str]] = {}
    for i, s in sets.items():
        if not s:
            continue
        n = len(s)
        p = n - math.ceil(TAU * n) + 1
        prefix_of[i] = sorted(s, key=order)[:p]
    # candidate generation: share a prefix token + pass the length filter
    cands = set()
    index: dict[str, list[int]] = {}
    for i, pref in prefix_of.items():
        for t in pref:
            index.setdefault(t, []).append(i)
    for ids in index.values():
        for a, b in itertools.combinations(sorted(ids), 2):
            na, nb = len(sets[a]), len(sets[b])
            if na * TAU <= nb and nb * TAU <= na:
                cands.add((a, b))
    out = set()
    for a, b in cands:
        sa, sb = sets[a], sets[b]
        j = len(sa & sb) / len(sa | sb)
        if j >= TAU:
            out.add((a, b, round(j, 9)))
    return out


@settings(max_examples=300, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(corpora)
def test_prefix_filter_equals_brute_force(raw):
    sets = {i: frozenset(s) for i, s in enumerate(raw)}
    assert _prefix_filter_pairs(sets) == _brute_pairs(sets)


def test_prefix_filter_spark_matches_brute_force_on_fixture(spark):
    """End-to-end: the registered Spark query's output equals a pure-
    Python brute force over the same sampled corpus."""
    from amazon_kinesis_data_analytics_flinktableapi_spark.queries import REGISTRY
    from amazon_kinesis_data_analytics_flinktableapi_spark.queries.llm import (
        _docs_with_neardup_copies,
    )
    from tests.conftest import SF_ORACLE

    corpus = _docs_with_neardup_copies(spark, SF_ORACLE).filter("doc_id % 10 = 0")
    sets = {}
    for r in corpus.collect():
        toks = [t for t in (r["text"] or "").split() if t]
        sh = frozenset(
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        ) if len(toks) >= 3 else frozenset()
        if sh:
            sets[r["doc_id"]] = sh
    want = _brute_pairs(sets)
    got = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in REGISTRY["prefix_filter_setjoin"].fn(spark, SF_ORACLE).collect()
    }
    assert got == want

"""Property tests: exact_median_select vs sorted() and the Count-Min
sketch vs a dict-reference, over hypothesis-generated inputs — proving
the distributed algorithms equal their straight-line definitions
independently of the SQL oracles."""

from __future__ import annotations

import os
import tempfile
from collections import Counter

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from amazon_kinesis_data_analytics_flinktableapi_spark.queries import REGISTRY


def _events_dir(values):
    d = tempfile.mkdtemp(prefix="sel_prop_")
    n = len(values)
    pdf = pd.DataFrame({
        "event_id": pd.array(range(n), dtype="int64"),
        "ts": pd.to_datetime(["2026-01-01"] * n).astype("datetime64[us]"),
        "user_id": pd.array([0] * n, dtype="int64"),
        "event_type": ["x"] * n,
        "value": [None if v is None else float(v) for v in values],
        "props": [None] * n,
    })
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                   os.path.join(d, "events.parquet"))
    return d


# duplicates, negatives, huge spread, clustered values, NULLs — the bucket
# narrowing's adversaries.  Finite floats only (NaN exclusion is pinned in
# the query's own filter; hypothesis floats here keep the oracle defined)
_vals = st.lists(
    st.one_of(
        st.none(),
        st.floats(allow_nan=False, allow_infinity=False, width=32),
        st.sampled_from([0.0, -0.0, 1.5, 1.5, 1.5, -7.25]),
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=15, deadline=None)
@given(values=_vals)
def test_exact_median_select_matches_sorted_reference(spark, values):
    d = _events_dir(values)
    out = REGISTRY["exact_median_select"].fn(spark, d).collect()
    ref = sorted(
        (float(v), i) for i, v in enumerate(values) if v is not None
    )
    if not ref:
        assert out == []
        return
    k = (len(ref) + 1) // 2
    want_value, want_id = ref[k - 1]
    assert len(out) == 1
    r = out[0]
    assert (r["event_id"], r["median_value"], r["k"]) == (want_id, want_value, k), (
        values, out, ref,
    )


def _ref_cms(tokens, rows, p, w):
    import hashlib

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % p

    counters = [Counter() for _ in rows]
    for t in tokens:
        hv = h60(t)
        for j, (a, b) in enumerate(rows):
            counters[j][((a * hv + b) % p) % w] += 1
    def estimate(t):
        hv = h60(t)
        return min(counters[j][((a * hv + b) % p) % w] for j, (a, b) in enumerate(rows))
    return estimate


@settings(max_examples=10, deadline=None)
@given(words=st.lists(st.text(alphabet="abcd", min_size=1, max_size=3), min_size=1, max_size=60))
def test_countmin_estimates_match_reference(spark, words):
    from amazon_kinesis_data_analytics_flinktableapi_spark.queries.mining import (
        _CMS_P,
        _CMS_ROWS,
        _CMS_W,
    )

    d = tempfile.mkdtemp(prefix="cms_prop_")
    text = " ".join(words)
    pdf = pd.DataFrame({
        "doc_id": pd.array([0], dtype="int64"),
        "text": [text],
        "lang": ["en"],
        "source": ["s"],
        "n_chars": pd.array([len(text)], dtype="int64"),
    })
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                   os.path.join(d, "documents.parquet"))
    out = REGISTRY["heavy_hitters_countmin"].fn(spark, d).collect()
    est = _ref_cms(words, _CMS_ROWS, _CMS_P, _CMS_W)
    exact = Counter(words)
    assert out  # at least one token exists
    for r in out:
        assert r["exact_cnt"] == exact[r["token"]], r
        assert r["cms_est"] == est(r["token"]), r
        assert r["cms_est"] >= r["exact_cnt"]

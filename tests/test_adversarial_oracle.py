"""Adversarial-input parity: the 10 registry queries with the narrowest
fixture coverage (VERDICT r10 #7 — no dedicated unit test exercised them
beyond the driver's well-behaved synthetic tables) re-run against a
HOSTILE fixture dir, still compared hash-for-hash with their own DuckDB
oracle on the SAME data.  The property under test is not "doesn't
crash" but "Spark and the oracle agree even on inputs the driver never
generates": empty/whitespace/unicode/NULL text, single-event users,
all-NULL group keys, tied timestamps, out-of-order funnels, negative
and NULL monetary values, single-row and empty groups.

The fixture tables keep the driver's exact parquet schemas (read from
TESTDATA and re-used for the write), so `sources/batch.read_table`'s
timestamp normalization and every oracle view see the same physical
types as production data.
"""

from __future__ import annotations

import datetime as dt
import shutil

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from amazon_kinesis_data_analytics_flinktableapi_spark.queries import all_specs
from tests.conftest import SF_SMOKE
from tests.oracle_util import TESTDATA_TABLES, compare, duck_connect

SPECS = all_specs()

# the 10 narrowest-coverage queries (zero direct test-file mentions at
# r10), one adversarial scenario each — documented inline in the fixture
ADVERSARIAL_QUERIES = [
    "char_entropy_score",        # empty/whitespace/single-char/unicode text
    "bpe_token_estimate",        # NULL text, punctuation-only, empty string
    "cusum_changepoint",         # single-day users, NULL value, pre-epoch day
    "event_transition_matrix",   # NULL event_type key, tied timestamps
    "cohort_retention",          # single-event user, NULL ts
    "funnel_steps",              # step-2 event BEFORE step-1, missing steps
    "asof_forward_join",         # no-match orders, NULL currency, NULL time
    "canonical_doc_select",      # exact-dup tie (equal length, id tiebreak)
    "correlated_subquery",       # single-order groups, negative & NULL price
    "domain_mixture_sample",     # NULL source, unparsable source suffix
    # --- promoted from tools/adversarial_sweep.py (full-registry pass):
    # every query below FAILED the sweep on this fixture before its r11
    # fix — they stay here so the hazards can't regress
    "cogroup_asof_pandas",       # merge_asof NaT crash, NULL-key cogroup
    "json_extract_agg",          # oracle crashed on empty-string props
    "lag_lead_gaps",             # NULL-ts window-order divergence
    "window_moving_avg",         # NULL-ts window-order divergence
    "window_running_distinct",   # NULL-ts window-order divergence
    "snapshot_cdc_diff",         # presence inferred from NULL-able value col
    "sliding_window_events",     # NULL ts: window() drops vs oracle kept
    "session_gaps_islands",      # NULL ts attached to arbitrary session
    "streaming_session_window",  # watermark drops NULL ts; oracle kept it
    "streaming_running_aggregate",  # NULL value NaN-poisoned fold state
    "sequence_packing",          # DuckDB // truncates; floor pinned
    "dedup_fingerprint",         # concat_ws swallowed NULL text to ''
    "split_leakage_audit",       # DuckDB array_to_string([]) is NULL
    "rolling_fingerprint",       # NULL text aliased to empty-doc hash 0
    "token_stats",               # NULL text mean 0.0 vs NULL
    "duplicate_span_removal",    # NULL text pass-through semantics
    "edit_distance_verify",      # byte- vs codepoint-level levenshtein
    "media_decode_meta",         # NULL payload decoded as 0-byte file
    "media_resize",              # NULL payload scaled to 0 bytes
    "pandas_udaf_weighted_avg",  # np.floor(NaN).astype(int64) garbage
    "approx_sketches_bounds",    # interpolated-quantile gate broken at small n
    "rolling_anomaly_flags",     # DuckDB nondeterministic NULL window sort
    "theilsen_trend",            # same daily-series shape, fixed preventively
]


def _ts(s: str | None):
    return None if s is None else dt.datetime.fromisoformat(s)


def _write(adv_dir, name: str, rows: list[dict]) -> None:
    schema = pq.read_schema(f"{SF_SMOKE}/{name}.parquet")
    cols = {f.name: [r.get(f.name) for r in rows] for f in schema}
    table = pa.Table.from_pandas(
        pd.DataFrame(cols, columns=[f.name for f in schema]),
        schema=schema, preserve_index=False,
    )
    pq.write_table(table, str(adv_dir / f"{name}.parquet"))


@pytest.fixture(scope="module")
def adv_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("adversarial_sf")

    fox = "The quick brown fox jumps over the lazy dog"
    docs = [
        # empty / whitespace-only text: zero-char histogram, zero BPE tokens
        dict(doc_id=1, text="", lang="en", source="src0"),
        dict(doc_id=2, text="   ", lang="en", source="src1"),
        # single-char run: entropy exactly 0 (the -0.0 floor/cast edge)
        dict(doc_id=3, text="aaaaaaaa", lang="en", source="src2"),
        # exact-dup pair of equal length: canonical pick must fall to the
        # doc_id tiebreak, not arbitrary partition order
        dict(doc_id=4, text=fox, lang="en", source="src3"),
        dict(doc_id=5, text=fox, lang="en", source="src4"),
        # multi-byte chars: length()/substr() are codepoint-counted on
        # both engines or the entropy denominator drifts
        dict(doc_id=6, text="héllo wörld ünïcode ünïcode héllo", lang="de",
             source="srcX"),  # unparsable source suffix → ELSE rate class
        dict(doc_id=7, text="!!! ??? ... ,,,", lang=None, source="src7"),
        dict(doc_id=8, text="x", lang="en", source=None),  # NULL source key
        dict(doc_id=9, text=None, lang="en", source="src9"),  # NULL text
        dict(doc_id=10, text="one two", lang="en", source="src10"),  # <3 tokens
    ]
    for r in docs:
        r["n_chars"] = len(r["text"]) if r["text"] is not None else None
    _write(d, "documents", docs)

    ev = [
        # user 1: a single event ever — singleton cohort, one-day cusum,
        # no transitions, funnel stops at step 1
        dict(event_id=1, ts="2024-01-05T10:00:00", user_id=1,
             event_type="signup", value=1.0, props=None),
        # user 2: full funnel; two clicks share one timestamp (sequence
        # tie broken by event_id on both engines); id 17 also feeds the
        # as-of rate side (event_id % 17 == 0)
        dict(event_id=17, ts="2024-01-06T10:00:00", user_id=2,
             event_type="signup", value=2.5, props=""),
        dict(event_id=18, ts="2024-01-06T11:00:00", user_id=2,
             event_type="click", value=-3.5, props=None),  # negative value
        dict(event_id=19, ts="2024-01-06T11:00:00", user_id=2,
             event_type="click", value=7.0, props="{}"),
        dict(event_id=20, ts="2024-01-07T09:00:00", user_id=2,
             event_type="purchase", value=0.0, props=None),
        # user 3: click BEFORE signup — must not count as funnel step 2
        dict(event_id=21, ts="2024-01-08T09:00:00", user_id=3,
             event_type="click", value=1.25, props=None),
        dict(event_id=22, ts="2024-01-09T09:00:00", user_id=3,
             event_type="signup", value=None, props=None),  # NULL value
        # user 4: pre-2024 day (negative cusum day index), NULL event_type
        # (all-NULL group key), NULL ts (window-order null placement)
        dict(event_id=23, ts="2023-12-30T23:59:59", user_id=4,
             event_type="browse", value=10.0, props=None),
        dict(event_id=24, ts="2024-01-01T00:00:00", user_id=4,
             event_type=None, value=5.0, props=None),
        dict(event_id=25, ts=None, user_id=4,
             event_type="click", value=6.0, props=None),
        # user 5: purchase with no signup — funnel must not resurrect it;
        # id 34 is the second as-of rate row
        dict(event_id=34, ts="2024-02-15T12:00:00", user_id=5,
             event_type="purchase", value=3.0, props=None),
    ]
    for r in ev:
        r["ts"] = _ts(r["ts"])
    _write(d, "events", ev)

    odate = _ts("2024-03-01T00:00:00")
    orders = [
        # single-order customers: price > 2·avg(own) reduces to p > 2p —
        # false for p ≥ 0, TRUE for negative p
        dict(o_orderkey=1, o_custkey=10, o_totalprice=100.0),
        dict(o_orderkey=2, o_custkey=11, o_totalprice=-50.0),
        dict(o_orderkey=3, o_custkey=12, o_totalprice=10.0),
        dict(o_orderkey=4, o_custkey=12, o_totalprice=1000.0),
        dict(o_orderkey=5, o_custkey=13, o_totalprice=None),  # all-NULL group
        dict(o_orderkey=6, o_custkey=14, o_totalprice=0.0),   # 0 > 0 edge
        dict(o_orderkey=7, o_custkey=15, o_totalprice=None),  # NULL inside avg
        dict(o_orderkey=8, o_custkey=15, o_totalprice=30.0),
        dict(o_orderkey=9, o_custkey=16, o_totalprice=5.0),
        dict(o_orderkey=10, o_custkey=16, o_totalprice=5.0),
        dict(o_orderkey=11, o_custkey=16, o_totalprice=50.0),
    ]
    for r in orders:
        r.update(o_orderstatus="O", o_orderdate=odate, o_orderpriority="1-URGENT")
    _write(d, "orders", orders)

    # remaining tables: driver originals (schemas + views must exist)
    for t in TESTDATA_TABLES:
        if t not in ("documents", "events", "orders"):
            shutil.copyfile(f"{SF_SMOKE}/{t}.parquet", str(d / f"{t}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def adv_duck(adv_dir):
    con = duck_connect(adv_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", ADVERSARIAL_QUERIES)
def test_adversarial_parity(spark, adv_duck, adv_dir, name):
    spec = SPECS[name]
    assert spec.oracle is not None
    compare(spec.fn(spark, adv_dir), adv_duck, spec.oracle)


def test_adversarial_outputs_nonempty(spark, adv_dir):
    """The fixture must actually EXERCISE the queries: a parity pass on
    10 empty results would prove nothing.  Spot-pin the expected shapes
    that encode each trap (values derived by hand, asserted not assumed).
    """
    rows = {
        tuple(r)
        for r in SPECS["correlated_subquery"].fn(spark, adv_dir)
        .select("o_orderkey").collect()
    }
    # negative single-order customer (p > 2p for p < 0) and the 50-over-avg
    assert rows == {(2,), (11,)}

    funnel = {
        r["step"]: r["n_users"]
        for r in SPECS["funnel_steps"].fn(spark, adv_dir).collect()
    }
    # user 3's click precedes signup; user 5's purchase has no signup
    assert funnel == {"step1_signup": 3, "step2_click": 1, "step3_purchase": 1}

    ent = {
        r["doc_id"]: r["entropy_millibits"]
        for r in SPECS["char_entropy_score"].fn(spark, adv_dir).collect()
    }
    assert 1 not in ent and 9 not in ent  # empty + NULL text drop out
    assert ent[2] == 0 and ent[3] == 0    # single-symbol runs: exactly 0 bits

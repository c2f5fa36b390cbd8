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
from pathlib import Path

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

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


# ---------------------------------------------------------------------------
# Skew edition: the HOT-KEY fixture.  Same schemas, but every distribution
# the engine's skew defenses exist for: one user holding 70% of events,
# one event type at 85%, one customer holding 70% of orders, one hot part
# and supplier, a 100-doc exact-duplicate mega-cluster, a boilerplate
# sentence in EVERY document (shingle df = 100% — max_df cap territory),
# and 100 bit-identical embedding vectors.  Parity with the DuckDB oracle
# on the SAME data is still the property: the cap/tie-break/cluster logic
# must agree under skew, not just on the driver's well-spread synthetic.
# All generation is closed-form arithmetic on the row index — no RNG.
# ---------------------------------------------------------------------------

SKEW_QUERIES = [
    "neardup_jaccard",           # boilerplate shingles over the max_df cap
    "containment_neardup",       # same index under 100% - df shingles
    "dedup_clusters",            # 200-node exact-dup clique through CC
    "canonical_doc_select",      # argmax inside the mega-cluster
    "dedup_exact",               # 100-way duplicate groups
    "dedup_fingerprint",         # fingerprint collisions at volume
    "duplicate_span_removal",    # one span repeated across 100 docs
    "event_transition_matrix",   # hot user: 5600-event single partition
    "window_running_distinct",   # hot user's running window
    "session_gaps_islands",      # one giant session for the hot user
    "topk_orders",               # hot customer dominates ranking ties
    "join_key_skew_report",      # the skew diagnostic ON skewed data
    "correlated_subquery",       # hot customer's group avg
    "ann_cosine_topk",           # 100 identical vectors: tie-break storm
    "embedding_neardup",         # identical vectors bucket together
    # caught by the full-registry skew sweep (r11) and fixed:
    "sliding_window_events",     # round(sum(double)) summation-order tie
    "streaming_static_enrich",   # per-row .xx5 HALF_UP tie at 359.285
]


def _skew_docs() -> list[dict]:
    boiler = "terms of service apply to all users of this site"
    mega = boiler + " the same exact duplicated body repeated verbatim everywhere"
    docs = []
    for i in range(400):
        if i < 100:  # the mega-cluster: bit-identical text
            text = mega
        elif i < 150:  # 10 near-dup clusters of 5 (one word varies)
            c, m = (i - 100) // 5, (i - 100) % 5
            words = [f"c{c}w{(c * 7 + j) % 53}" for j in range(25)]
            words[7] = f"variant{m}"
            text = boiler + " " + " ".join(words)
        else:  # unique-ish word soup, still carrying the boilerplate
            words = [f"w{(i * 7 + j * 13) % 997}u{i}" for j in range(30)]
            text = boiler + " " + " ".join(words)
        docs.append(
            dict(doc_id=i, text=text, lang=["en", "de", "es", "fr", "zh"][i % 5],
                 source=f"src{i % 17}", n_chars=len(text))
        )
    return docs


def _skew_events() -> list[dict]:
    base = dt.datetime(2024, 3, 1)
    types = ["view", "click", "signup", "purchase", "error"]
    ev = []
    for i in range(8000):
        hot = i < 5600  # 70% of events belong to user 777
        uid = 777 if hot else 100 + (i % 37)
        # hot user: bursts of 10 events sharing ONE timestamp (tie storms)
        ts = base + dt.timedelta(seconds=(i // 10) * 5 if hot else i * 11)
        etype = "view" if i % 100 < 85 else types[i % 5]  # 85% one type
        # binary-exact values (multiples of 1/64): sums of these are EXACT
        # doubles in any order, so round()-family queries can never flake
        # on a .xx5 tie in this fixture.  (Decimal-structured values DID
        # flake the sweep once — 1312.715 in sliding_window_events — and
        # the queries caught that way are now integer-exact by
        # construction; the fixture no longer needs to roll that dice for
        # the rest of the registry.)
        ev.append(
            dict(event_id=i, ts=ts, user_id=uid, event_type=etype,
                 value=(i % 997) / 8.0 + (i % 13) / 64.0,
                 props='{"k": %d}' % (i % 50))
        )
    return ev


def _skew_orders() -> list[dict]:
    base = dt.datetime(2024, 2, 1)
    out = []
    for i in range(3000):
        out.append(
            dict(
                o_orderkey=i,
                o_custkey=7 if i % 10 < 7 else (i * 13) % 150,  # 70% one customer
                o_orderstatus=["F", "O", "P"][i % 3],
                o_totalprice=round(100.0 + (i % 887) * 1.25, 2),
                o_orderdate=base + dt.timedelta(hours=i % 720),
                o_orderpriority=f"{1 + i % 5}-X",
            )
        )
    return out


def _skew_lineitem() -> list[dict]:
    base = dt.datetime(2024, 2, 10)
    out = []
    for i in range(9000):
        out.append(
            dict(
                l_orderkey=i % 3000,
                l_partkey=13 if i % 5 < 3 else (i * 17) % 200,  # 60% one part
                l_suppkey=3 if i % 2 == 0 else (i * 7) % 10,    # 50% one supplier
                l_linenumber=i // 3000 + 1,
                l_quantity=float(1 + i % 50),
                l_extendedprice=round(10.0 + (i % 991) * 2.5, 2),
                l_discount=round((i % 11) / 100.0, 2),
                l_tax=round((i % 9) / 100.0, 2),
                l_returnflag=["A", "N", "R"][i % 3],
                l_linestatus=["F", "O"][i % 2],
                l_shipdate=base + dt.timedelta(hours=i % 2000),
            )
        )
    return out


def _skew_embeddings() -> list[dict]:
    out = []
    for i in range(300):
        if i < 100:  # bit-identical vectors (1/16ths are exact in float32)
            vec = [((j * 5 + 3) % 31 - 15) / 16.0 for j in range(64)]
        elif i < 200:  # two tight clusters around distinct centers
            c = (i - 100) % 2
            vec = [((j * 7 + c * 11) % 29 - 14) / 16.0 + (i % 5) / 256.0
                   for j in range(64)]
        else:  # spread
            vec = [((i * 3 + j * 13) % 61 - 30) / 16.0 for j in range(64)]
        out.append(dict(vec_id=i, embedding=vec, label=i % 6))
    return out


@pytest.fixture(scope="module")
def skew_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("skew_sf")
    _write(d, "documents", _skew_docs())
    _write(d, "events", _skew_events())
    _write(d, "orders", _skew_orders())
    _write(d, "lineitem", _skew_lineitem())
    _write(d, "embeddings", _skew_embeddings())
    for t in TESTDATA_TABLES:
        if t not in ("documents", "events", "orders", "lineitem", "embeddings"):
            shutil.copyfile(f"{SF_SMOKE}/{t}.parquet", str(d / f"{t}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def skew_duck(skew_dir):
    con = duck_connect(skew_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", SKEW_QUERIES)
def test_skew_parity(spark, skew_duck, skew_dir, name):
    spec = SPECS[name]
    assert spec.oracle is not None
    compare(spec.fn(spark, skew_dir), skew_duck, spec.oracle)


def test_skew_fixture_is_skewed(spark, skew_dir):
    """Pin the skew shapes so the fixture can't silently flatten: the hot
    keys must actually dominate, and the mega-cluster must actually be
    over the max_df cap (so test_skew_parity exercises the capped path)."""
    ev = spark.read.parquet(f"{skew_dir}/events.parquet")
    by_user = dict(
        (r["user_id"], r["n"])
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    assert by_user[777] == 5600 and by_user[777] / sum(by_user.values()) == 0.7
    clusters = SPECS["dedup_clusters"].fn(spark, skew_dir)
    top = (
        clusters.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("m")).collect()[0]["m"]
    )
    # the 100 identical docs + their 80%-prefix copies form one component
    assert top >= 200, top


# --- non-finite edition (r14 audit) ----------------------------------------
# A third fixture: the smoke events table plus three rows whose ``value`` is
# NaN / +inf / -inf.  The r14 full-registry probe measured the blast radius:
# 185/215 queries are tolerant (identical results on both engines — NULL
# propagation, non-finite filters, or value-independence); the 30 below
# ABORT — loudly and on BOTH engines (Spark ANSI CAST_OVERFLOW on inf→int
# bindings; DuckDB Conversion/Out-of-Range on the same expressions;
# stddev/quantile range errors), never silently wrong — or diverge in
# NaN-ordering corners.  The list is a REVIEWED ledger, not an aspiration:
# tools/adversarial_sweep.py --fixture nonfinite fails on any NEW
# intolerant query and on any listed query that has become tolerant
# (remove it here when hardening lands — the r15 plan is to extend the
# reference's own malformed-record swallow policy, StreamingJob.java's
# deserializer returning null, to non-finite numeric bindings).
NONFINITE_INTOLERANT: list[str] = [
    # EMPTY since r14 hardening wave 2: every registered query now
    # swallows non-finite value rows at its int/cents binding (the
    # reference's malformed-record degrade-don't-abort policy,
    # functions.scalar.finite_or_null, mirrored as isfinite() in each
    # oracle) or is value-independent.  The wave-1/wave-2 history lives
    # in COVERAGE.md's non-finite audit section.  The sweep's rot check
    # keeps this list honest in BOTH directions: a new intolerant query
    # fails the sweep, and a listed query that passes must be delisted.
]


@pytest.fixture(scope="module")
def nonfinite_dir(tmp_path_factory):
    return make_nonfinite_dir(tmp_path_factory.mktemp("nonfinite_sf"))


def make_nonfinite_dir(d) -> str:
    """Smoke tables + three non-finite events.value rows (shared with
    tools/adversarial_sweep.py --fixture nonfinite)."""
    ev = pq.read_table(f"{SF_SMOKE}/events.parquet")
    df = ev.to_pandas()
    ts = df["ts"].iloc[0]
    extra = pd.DataFrame(
        [
            dict(event_id=10_000_001, ts=ts, user_id=11, event_type="click",
                 value=float("nan"), props=None),
            dict(event_id=10_000_002, ts=ts, user_id=12, event_type="view",
                 value=float("inf"), props=None),
            dict(event_id=10_000_003, ts=ts, user_id=13, event_type="purchase",
                 value=float("-inf"), props=None),
            # 10_000_012 ≡ 0 (mod 17): lands in the RATE side of every
            # orders/rates role split, so the rate-side swallow is
            # exercised too (the first three ids all miss the % 17 filter)
            dict(event_id=10_000_012, ts=ts, user_id=14, event_type="click",
                 value=float("inf"), props=None),
        ]
    )
    out = pd.concat([df, extra], ignore_index=True)[[f.name for f in ev.schema]]
    pq.write_table(
        pa.Table.from_pandas(out, schema=ev.schema, preserve_index=False),
        str(Path(d) / "events.parquet"),
    )
    # malformed EMBEDDINGS too (r14 embeddings audit): one NaN-component,
    # one inf-component, one NULL-element vector — the whole ANN/dedup
    # tier must swallow these rows (finite_embedding / nse_oracle)
    et = pq.read_table(f"{SF_SMOKE}/embeddings.parquet")
    edf = et.to_pandas()
    dim = len(edf["embedding"].iloc[0])
    base = edf.iloc[0].to_dict()
    erows = []
    for vid, vec in (
        (9_000_001, [float("nan")] * 4 + [0.1] * (dim - 4)),
        (9_000_002, [float("inf")] + [0.2] * (dim - 1)),
        (9_000_003, [None] + [0.3] * (dim - 1)),
    ):
        r = dict(base)
        r["vec_id"] = vid
        r["embedding"] = vec
        erows.append(r)
    eout = pd.concat([edf, pd.DataFrame(erows)], ignore_index=True)[
        [f.name for f in et.schema]
    ]
    pq.write_table(
        pa.Table.from_pandas(eout, schema=et.schema, preserve_index=False),
        str(Path(d) / "embeddings.parquet"),
    )
    for t in TESTDATA_TABLES:
        if t not in ("events", "embeddings"):
            shutil.copyfile(f"{SF_SMOKE}/{t}.parquet", str(Path(d) / f"{t}.parquet"))
    return str(d)


#: tolerant-by-construction representatives pinned in pytest (the full 215
#: run is the sweep's job): the r14 selection family filters non-finite
#: explicitly, and exact_median_select is the r13 op the ADVICE fix hardened
NONFINITE_PINNED = [
    "exact_median_select",
    "grouped_median_select",
    "grouped_percentiles_select",
    "robust_mad_select",
    "token_budget_waterfill",
]


@pytest.mark.parametrize("name", NONFINITE_PINNED)
def test_nonfinite_parity_pinned(spark, nonfinite_dir, name):
    compare(SPECS[name].fn(spark, nonfinite_dir), duck_connect(nonfinite_dir),
            SPECS[name].oracle)


def test_nonfinite_ledger_names_registered():
    unknown = [n for n in NONFINITE_INTOLERANT if n not in SPECS]
    assert not unknown, f"intolerance ledger names not in registry: {unknown}"
    assert len(set(NONFINITE_INTOLERANT)) == len(NONFINITE_INTOLERANT)


# ---------------------------------------------------------------------------
# Unicode edition (r14 audit wave 4): the text tier's remaining hostile
# class — inputs where the ENGINES' unicode machinery, not the data
# values, can diverge: astral-plane chars (UTF-16 surrogate pairs on the
# JVM vs UTF-8 codepoints in DuckDB — length/substr/regex off-by-N
# class), NFC/NFD combining-mark twins (equality and md5 differ unless
# BOTH engines stay normalization-naive), locale case mappings
# (Turkish I, German sharp-s, Greek final sigma — JDK vs utf8proc), the
# whitespace zoo OUTSIDE regex \\s (NBSP, ZWSP, ideographic space,
# U+2028/2029 — tokenizer boundary parity), bidi/RTL runs, ZWJ emoji
# sequences, an embedded NUL, and a leading BOM.  Parity on the SAME
# data is still the property: a divergence here is a silent
# wrong-answer on real multilingual corpora, exactly the 100 TB input
# class (the reference pipeline ingests arbitrary user JSON).  Texts
# are spelled in ASCII escapes so each hazard is visible in review.
# ---------------------------------------------------------------------------

UNICODE_DOCS = [
    # astral plane: every emoji is one codepoint, two UTF-16 units
    '\U0001f600\U0001f600 \U0001f389 emoji only \U0001f600',
    # astral letterforms (mathematical alphanumerics)
    '\U0001d11e astral \U0001d518\U0001d52b\U0001d526\U0001d520 math \U0001d49c\U0001d4c1 letters',
    # NFD (e + combining acute) vs NFC (precomposed) of the SAME word:
    # distinct byte strings that render identically
    'cafe\u0301 caf\xe9 nfd nfc twins',
    # Turkish dotted/dotless I: JDK vs utf8proc case-mapping corner
    'I\u0131 \u0130i istanbul TURKISH case',
    # German sharp-s: lower(SS) vs upper(ß) asymmetry
    'STRASSE stra\xdfe \u1e9e sharp s',
    # Greek capital + final sigma: context-sensitive lowercase corner
    '\u03a3\u03af\u03c3\u03c5\u03c6\u03bf\u03c2 \u03a3 sigma final \u03c2',
    # control whitespace INSIDE regex \\s: tab, vertical tab, form feed
    'tab\tsep\x0bvertical\x0cformfeed mix',
    # whitespace zoo OUTSIDE \\s: NBSP, ZWSP, ideographic space — these
    # must NOT split tokens on either engine
    'nbsp\xa0joined zwsp\u200bjoined ideo\u3000space',
    # line/paragraph separators U+2028/2029: \\s membership parity
    'line\u2028sep para\u2029sep tokens',
    # RTL Arabic + Hebrew with LTR english: bidi must not affect byte order
    '\u0645\u0631\u062d\u0628\u0627 bidi \u05e9\u05dc\u05d5\u05dd mixed english',
    # combining-mark stacks (zalgo): grapheme != codepoint != byte
    'combining a\u0300\u0316\u035c stack z\u0335\u0327 zalgo',
    # embedded NUL: length-prefixed strings on both engines, not C strings
    'null\x00byte embedded',
    # leading BOM / ZWNBSP: a token prefix, not a stripped marker
    '\ufeffBOM leading text',
    # LEADING/TRAILING unicode spaces: DuckDB's bare trim() strips
    # NBSP/U+3000, Spark's trim strips ASCII 0x20 only — oracles must
    # use the explicit-charset trim or the first/last token diverges
    '\xa0lead nbsp trail\xa0',
    # LEADING VT: in Java's \\s (a boundary) but not RE2's
    '\x0bvt lead ideo trail\u3000',
    # regional-indicator flags + ZWJ family: joiner sequences
    '\U0001f1fa\U0001f1f8 flags \U0001f468\u200d\U0001f469\u200d\U0001f467 zwj family',
]

#: queries that diverge between Spark and DuckDB on the unicode fixture —
#: a REVIEWED ledger with the same two-sided rot contract as
#: NONFINITE_INTOLERANT: tools/adversarial_sweep.py --fixture unicode
#: fails on any NEW divergent query and on any listed query that has
#: become clean (delist when hardening lands).
UNICODE_INTOLERANT: list[str] = []


def make_unicode_dir(d) -> str:
    """Smoke tables + the hostile unicode documents (appended, ids
    11_000_001+, so every doc-tier query sees its normal corpus PLUS the
    hostile rows) + two events rows whose event_type is a non-BMP string
    (group keys / transition labels built from astral chars).  Shared
    with tools/adversarial_sweep.py --fixture unicode."""
    dtab = pq.read_table(f"{SF_SMOKE}/documents.parquet")
    ddf = dtab.to_pandas()
    extra = pd.DataFrame(
        [
            dict(doc_id=11_000_001 + i, text=t, lang="xx", source="uni",
                 n_chars=len(t))
            for i, t in enumerate(UNICODE_DOCS)
        ]
    )
    dout = pd.concat([ddf, extra], ignore_index=True)[[f.name for f in dtab.schema]]
    pq.write_table(
        pa.Table.from_pandas(dout, schema=dtab.schema, preserve_index=False),
        str(Path(d) / "documents.parquet"),
    )
    ev = pq.read_table(f"{SF_SMOKE}/events.parquet")
    edf = ev.to_pandas()
    ts = edf["ts"].iloc[0]
    eextra = pd.DataFrame(
        [
            dict(event_id=11_000_001, ts=ts, user_id=21,
                 event_type="\U0001F6D2purchase", value=1.5, props=None),
            dict(event_id=11_000_002, ts=ts, user_id=21,
                 event_type="\U0001D11Eview", value=2.5,
                 props='{"k": "véç\U0001F600"}'),
        ]
    )
    eout = pd.concat([edf, eextra], ignore_index=True)[[f.name for f in ev.schema]]
    pq.write_table(
        pa.Table.from_pandas(eout, schema=ev.schema, preserve_index=False),
        str(Path(d) / "events.parquet"),
    )
    for t in TESTDATA_TABLES:
        if t not in ("documents", "events"):
            shutil.copyfile(f"{SF_SMOKE}/{t}.parquet", str(Path(d) / f"{t}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def unicode_dir(tmp_path_factory):
    return make_unicode_dir(tmp_path_factory.mktemp("unicode_sf"))


#: representatives pinned in pytest (the full-registry run is the sweep's
#: job): the text operators whose unicode semantics carry the most
#: cross-engine machinery — tokenization, codepoint counting, case
#: mapping, regex classes, md5-over-UTF-8, BPE pre-tokenizer runs
UNICODE_PINNED = [
    "normalize_text",          # lower() case mapping + \s collapse
    "char_entropy_score",      # codepoint histogram over astral chars
    "token_stats",             # \s+ tokenizer boundaries vs the whitespace zoo
    "bpe_token_estimate",      # [^A-Za-z0-9\s]+ runs over emoji/ZWJ/bidi
    "dedup_exact",             # md5 over UTF-8 bytes (NFC/NFD must NOT collide)
    "lang_id",                 # lower() + stopword matching on mixed scripts
    "quality_classifier_score",  # md5 token hashing incl. NUL/BOM tokens
    "winnowing_fingerprint_stats",  # per-char rolling windows over astral text
]


@pytest.mark.parametrize("name", UNICODE_PINNED)
def test_unicode_parity_pinned(spark, unicode_dir, name):
    compare(SPECS[name].fn(spark, unicode_dir), duck_connect(unicode_dir),
            SPECS[name].oracle)


def test_unicode_ledger_names_registered():
    unknown = [n for n in UNICODE_INTOLERANT if n not in SPECS]
    assert not unknown, f"unicode ledger names not in registry: {unknown}"
    assert len(set(UNICODE_INTOLERANT)) == len(UNICODE_INTOLERANT)


def test_unicode_fixture_exercises_codepoints(spark, unicode_dir):
    """The fixture must actually stress the machinery: astral docs must
    survive the load with codepoint-counted lengths (a UTF-16 code-unit
    leak would count every astral char twice)."""
    docs = spark.read.parquet(f"{unicode_dir}/documents.parquet")
    got = {
        r["doc_id"]: r["n"]
        for r in docs.filter(F.col("doc_id") >= 11_000_001)
        .select("doc_id", F.length("text").alias("n"))
        .collect()
    }
    want = {11_000_001 + i: len(t) for i, t in enumerate(UNICODE_DOCS)}
    assert got == want

"""Unit tests for the r17 capability additions: Unicode NFC normalization,
Zipf-fit corpus statistics (regr_* aggregate family), and entity-resolution
survivorship merge (golden record).

The full oracle twins are covered registry-wide by tests/test_oracle.py and
the hostile sweeps; these tests pin the semantics the oracles cannot see —
three-way NFC parity (Spark UDF ≡ CPython unicodedata ≡ DuckDB utf8proc),
the Zipf slope on a synthetic exact-Zipf corpus, and the survivorship
tie-break rules on hand-built clusters.
"""

from __future__ import annotations

import math
import unicodedata

import duckdb
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from amazon_kinesis_data_analytics_flinktableapi_spark.functions.text import nfc_normalize_col
from amazon_kinesis_data_analytics_flinktableapi_spark.operators.dedup import survivorship_merge
from tests.test_adversarial_oracle import UNICODE_DOCS


# ---------------------------------------------------------------- NFC


def test_nfc_three_way_parity_on_hostile_strings(spark):
    """Spark-side NFC (pandas UDF over CPython's unicodedata) must agree
    byte-for-byte with BOTH reference implementations on every hostile
    unicode fixture string: CPython itself (trivially) and DuckDB's
    utf8proc ``nfc_normalize`` — the oracle twin.  NFD/NFC twins, zalgo
    combining stacks, astral plane, BOM, bidi: all compose identically
    under UAX #15 canonical composition."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(UNICODE_DOCS)], ["i", "text"]
    )
    got = {
        r["i"]: r["nfc"]
        for r in df.select("i", nfc_normalize_col("text").alias("nfc")).collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(UNICODE_DOCS):
        py = unicodedata.normalize("NFC", t)
        duck = con.execute("SELECT nfc_normalize(?)", [t]).fetchone()[0]
        assert got[i] == py, f"spark != cpython on {t!r}"
        assert py == duck, f"cpython != duckdb on {t!r}"
    con.close()


def test_nfc_null_and_composition(spark):
    """NULL in → NULL out; an NFD string actually composes (changes)."""
    nfd = "café"  # e + combining acute
    df = spark.createDataFrame([(1, nfd), (2, None), (3, "plain")], ["i", "text"])
    rows = {
        r["i"]: (r["nfc"], r["changed"])
        for r in df.select(
            "i",
            nfc_normalize_col("text").alias("nfc"),
            (~F.col("text").eqNullSafe(nfc_normalize_col("text"))).alias("changed"),
        ).collect()
    }
    assert rows[1] == ("caf\xe9", True)
    assert rows[2] == (None, False)
    assert rows[3] == ("plain", False)


# ---------------------------------------------------------------- Zipf fit


def test_zipf_slope_on_exact_zipf_corpus(spark):
    """A corpus whose type frequencies are EXACTLY f(r) = 840/r has
    ln f = ln 840 − 1·ln r: slope −1, intercept ln 840, r² = 1 (up to
    the 6-dp rounding the report applies).  840 = lcm(1..8), so every
    frequency is an exact integer — a 1000//r corpus would flooring-skew
    the law and the fit (slope −0.9961…, caught in review)."""
    from amazon_kinesis_data_analytics_flinktableapi_spark.queries.llm import zipf_fit_over

    rows = [
        Row(source="z", text=" ".join(f"tok{r:03d}" for _ in range(840 // r)))
        for r in range(1, 9)
    ]
    docs = spark.createDataFrame(rows)
    out = zipf_fit_over(docs).collect()
    assert len(out) == 1
    rep = out[0]
    assert rep["n_types"] == 8
    assert abs(rep["zipf_slope"] - (-1.0)) < 1e-6
    assert abs(rep["zipf_intercept"] - math.log(840.0)) < 1e-6
    assert abs(rep["zipf_r2"] - 1.0) < 1e-6


def test_zipf_degenerate_uniform_frequencies_null_r2(spark):
    """All type frequencies equal (every token unique ⇒ f ≡ 1) makes the
    fit undefined: ln f is constant, so r² is reported NULL — by the
    explicit min(f) = max(f) guard, which is integer-exact on both
    engines, NOT a var_pop() == 0.0 float comparison.  Slope is 0 (the
    flat line is a valid least-squares answer)."""
    from amazon_kinesis_data_analytics_flinktableapi_spark.queries.llm import zipf_fit_over

    docs = spark.createDataFrame([Row(source="u", text="a b c d e f g h")])
    rep = zipf_fit_over(docs).collect()[0]
    assert rep["n_types"] == 8
    assert rep["zipf_slope"] == 0.0
    assert rep["zipf_r2"] is None


def test_zipf_single_type_source_dropped(spark):
    """A source with one distinct type has one (rank, freq) point — no
    regression exists; the report drops it (n_types >= 2) rather than
    emitting engine-dependent NULL-vs-NaN edge values."""
    from amazon_kinesis_data_analytics_flinktableapi_spark.queries.llm import zipf_fit_over

    docs = spark.createDataFrame(
        [Row(source="one", text="same same same"), Row(source="two", text="x y x")]
    )
    out = {r["source"] for r in zipf_fit_over(docs).collect()}
    assert out == {"two"}


# ---------------------------------------------------------------- survivorship


def _members(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, cluster_id long, n_chars long, source string, lang string"
    )


def test_survivorship_field_rules(spark):
    """Field-wise merge on one cluster: golden id = min id, longest text
    wins with min-id tie-break, source follows the min id, lang is modal
    with (count desc, lang asc) tie-break, provenance is the sorted
    distinct source set."""
    m = _members(
        spark,
        [
            (10, 1, 50, "web", "de"),
            (11, 1, 80, "crawl", "en"),
            (12, 1, 80, "web", "en"),
            (13, 1, 20, "pdf", "fr"),
        ],
    )
    rec = survivorship_merge(m).collect()
    assert len(rec) == 1
    r = rec[0]
    assert r["golden_doc_id"] == 10
    assert r["n_members"] == 4
    # two docs tie at n_chars=80 → the SMALLER doc_id (11) wins
    assert r["longest_doc_id"] == 11
    assert r["golden_n_chars"] == 80
    assert r["golden_source"] == "web"  # source of doc 10, the min id
    assert r["modal_lang"] == "en"  # en ×2 beats de/fr ×1
    assert r["provenance"] == ["crawl", "pdf", "web"]


def test_survivorship_modal_lang_tie_breaks_alphabetically(spark):
    m = _members(spark, [(1, 7, 5, "s", "fr"), (2, 7, 6, "s", "de")])
    r = survivorship_merge(m).collect()[0]
    assert r["modal_lang"] == "de"  # 1-1 tie → lexicographically smallest


def test_survivorship_null_lengths_cluster(spark):
    """A cluster whose every member has NULL n_chars (NULL-text docs)
    still picks a deterministic longest_doc_id — the coalesce(n_chars, 0)
    composite makes the ordering key total, so the min id wins — and
    reports golden_n_chars NULL (max over all-NULL)."""
    m = _members(spark, [(5, 3, None, "a", "xx"), (6, 3, None, "b", "xx")])
    r = survivorship_merge(m).collect()[0]
    assert r["longest_doc_id"] == 5
    assert r["golden_n_chars"] is None
    assert r["golden_doc_id"] == 5
    assert r["provenance"] == ["a", "b"]


def test_survivorship_singletons_pass_through(spark):
    m = _members(spark, [(1, 1, 10, "a", "en"), (2, 2, 20, "b", "de")])
    out = {r["cluster_id"]: r for r in survivorship_merge(m).collect()}
    assert out[1]["golden_doc_id"] == 1 and out[1]["n_members"] == 1
    assert out[2]["longest_doc_id"] == 2 and out[2]["modal_lang"] == "de"

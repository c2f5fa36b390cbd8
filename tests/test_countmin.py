"""Count-Min heavy-hitters invariants (beyond the oracle hash-match)."""

from __future__ import annotations

from amazon_kinesis_data_analytics_flinktableapi_spark.queries import REGISTRY


def test_cms_never_underestimates_and_ranks_dense(spark):
    out = REGISTRY["heavy_hitters_countmin"].fn(spark, "/root/testdata/sf0.001").collect()
    assert len(out) == 20
    assert sorted(r["rank"] for r in out) == list(range(1, 21))
    for r in out:
        # the CMS one-sided error guarantee: min over rows >= true count
        assert r["cms_est"] >= r["exact_cnt"] > 0, r
        assert r["overestimate"] == r["cms_est"] - r["exact_cnt"]
    # rank order is exact-count order (desc, token asc tiebreak)
    by_rank = sorted(out, key=lambda r: r["rank"])
    counts = [r["exact_cnt"] for r in by_rank]
    assert counts == sorted(counts, reverse=True)


def test_encoding_artifact_signals_counts_planted_mojibake(spark):
    """All-zero parity on clean corpora is verified by the oracle; this
    pins NONZERO counting on planted artifacts (overlap-free left-to-right
    counts, multi-char marker divided by its length)."""
    import os
    import tempfile

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = [
        "caf\u00c3\u00a9 na\u00c3\u00afve",          # two \u00c3 sequences
        "he said \u00e2\u20ac\u0153hi\u00e2\u20ac",  # two \u00e2\u20ac sequences
        "bad byte \ufffd here \ufffd\ufffd",           # three replacement chars
        "clean text with none",
    ]
    d = tempfile.mkdtemp(prefix="moji_")
    pdf = pd.DataFrame({
        "doc_id": pd.array(range(len(texts)), dtype="int64"),
        "text": texts,
        "lang": ["en"] * len(texts),
        "source": ["s"] * len(texts),
        "n_chars": pd.array([len(t) for t in texts], dtype="int64"),
    })
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                   os.path.join(d, "documents.parquet"))
    out = {r["doc_id"]: r for r in
           REGISTRY["encoding_artifact_signals"].fn(spark, d).collect()}
    assert out[0]["c3_seq"] == 2 and out[0]["replacement"] == 0
    assert out[1]["euro_seq"] == 2
    assert out[2]["replacement"] == 3
    assert all(out[3][c] == 0 for c in ("c3_seq", "c2_seq", "euro_seq", "replacement"))

"""Chunking operator edge cases: coverage, overlap, short docs, boundaries."""

from __future__ import annotations

import pytest

from amazon_kinesis_data_analytics_flinktableapi_spark.operators.chunking import chunk_documents


@pytest.fixture(scope="module")
def chunks(spark):
    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(100))),  # 100 toks → 2 full + tail
            (2, "a b c"),                                 # shorter than one chunk
            (3, " ".join(f"t{i}" for i in range(64))),    # exactly one chunk
            (4, ""),                                      # empty → no chunks
            (5, " ".join(f"t{i}" for i in range(65))),    # one over the boundary
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, chunk_tokens=64, overlap=16)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    return {k: sorted(v, key=lambda r: r.chunk_idx) for k, v in by_doc.items()}


def test_full_coverage_with_overlap(chunks):
    rows = chunks[1]
    assert [r.chunk_idx for r in rows] == [0, 1]
    c0, c1 = rows[0].chunk_text.split(), rows[1].chunk_text.split()
    assert len(c0) == 64 and c0[0] == "t0"
    assert c1[0] == "t48"  # stride 48
    assert set(c0) | set(c1) == {f"t{i}" for i in range(100)}  # no token lost
    assert set(c0) & set(c1) == {f"t{i}" for i in range(48, 64)}  # 16-token overlap


def test_short_doc_single_chunk(chunks):
    assert len(chunks[2]) == 1 and chunks[2][0].n_tokens == 3


def test_exact_boundary_single_chunk(chunks):
    assert len(chunks[3]) == 1 and chunks[3][0].n_tokens == 64


def test_empty_doc_no_chunks(chunks):
    assert 4 not in chunks


def test_one_over_boundary_two_chunks(chunks):
    rows = chunks[5]
    assert len(rows) == 2
    assert rows[1].n_tokens == 65 - 48  # tail carries overlap + the extra token


def test_overlap_validation(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=8, overlap=8)

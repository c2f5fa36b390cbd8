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

"""Regression tests for the near-dup corpus memoization
(``queries/llm.py:_docs_with_neardup_copies``).

VERDICT r11 #1 root cause: ``spark.catalog.clearCache()`` UNREGISTERS a
cached plan from the CacheManager (it does not merely evict blocks), so
a memo hit after clearCache recomputed the corpus at each of its ~3
downstream plan references and never re-cached — the bench clearCaches
before every timed run, which made every driver bench sample of
``neardup_jaccard`` pay ~1.5× (measured 3.4 s vs 2.2 s at sf0.1, the
reported +134% regression).  Also covers the ADVICE r11 hazards:
unbounded growth across session restarts and stale file-index reuse
after an sf_dir regeneration.
"""

from __future__ import annotations

import os
import shutil

from amazon_kinesis_data_analytics_flinktableapi_spark.queries import llm

from tests.conftest import SF_ORACLE


def _cached(df) -> bool:
    sl = df.storageLevel
    return bool(sl.useMemory or sl.useDisk)


def test_memo_hit_recaches_after_clearcache(spark):
    llm._NEARDUP_CORPUS_CACHE.clear()
    df1 = llm._docs_with_neardup_copies(spark, SF_ORACLE)
    assert _cached(df1), "fresh corpus must be registered for caching"
    spark.catalog.clearCache()
    assert not _cached(df1), "clearCache unregisters the plan (the hazard under test)"
    df2 = llm._docs_with_neardup_copies(spark, SF_ORACLE)
    assert df2 is df1, "same session + same data must memo-hit"
    assert _cached(df2), "a hit whose storage level dropped to NONE must re-register"


def test_memo_key_includes_data_mtime(spark, tmp_path):
    """A regenerated sf_dir (new mtime) must rebuild, not serve the old
    corpus bound to the previous parquet file index."""
    sf = tmp_path / "sf"
    sf.mkdir()
    shutil.copy(os.path.join(SF_ORACLE, "documents.parquet"), sf / "documents.parquet")
    llm._NEARDUP_CORPUS_CACHE.clear()
    df1 = llm._docs_with_neardup_copies(spark, str(sf))
    os.utime(sf / "documents.parquet", ns=(1, 1))  # simulate regeneration
    df2 = llm._docs_with_neardup_copies(spark, str(sf))
    assert df2 is not df1
    assert len([k for k in llm._NEARDUP_CORPUS_CACHE if k[1] == str(sf)]) >= 1


def test_purge_drops_unreachable_entries(spark):
    """Entries whose session introspection fails are evicted on the next
    miss, bounding cache growth across session restarts."""

    class _DeadDF:
        @property
        def sparkSession(self):
            raise RuntimeError("context torn down")

    llm._NEARDUP_CORPUS_CACHE.clear()
    llm._NEARDUP_CORPUS_CACHE[(0, "dead", 0)] = _DeadDF()
    live = llm._docs_with_neardup_copies(spark, SF_ORACLE)  # miss → purge
    assert (0, "dead", 0) not in llm._NEARDUP_CORPUS_CACHE
    assert _cached(live)

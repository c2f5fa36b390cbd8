"""Pins for the two r13 code-review findings: NULL embeddings through the
ANN matrix path, and BPE encode-oracle agreement under early merge
exhaustion."""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from amazon_kinesis_data_analytics_flinktableapi_spark.operators import similarity as S


def _vectors_with_null(spark, n=120, dim=8):
    import numpy as np

    rng = np.random.RandomState(3)
    rows = [(i, [float(x) for x in rng.randn(dim)]) for i in range(n)]
    rows.append((n, None))  # the hostile row
    from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType

    schema = StructType(
        [StructField("vec_id", LongType()), StructField("embedding", ArrayType(FloatType()))]
    )
    return spark.createDataFrame(rows, schema)


def test_matrix_path_tolerates_null_embeddings(spark):
    """code-review r13 #1: np.stack over a batch containing None killed the
    task.  NULL rows must yield NULL buckets/probes (the expression
    path's semantics) — query completes, NULL id never appears."""
    vecs = _vectors_with_null(spark)
    queries = vecs.filter(F.col("vec_id") < 3)
    n = S.EXPR_CENTROID_CAP + 8  # force the matrix branch
    out = S.ivf_topk_det(vecs, queries, k=5, n_centroids=n, nprobe=3).collect()
    assert out and all(r.c_id != 120 and r.q_id != 120 for r in out)
    # semantic_dedup: matrix path must MATCH the expression path exactly,
    # including the established NULL semantics (the NULL-embedding row
    # survives with a NULL cluster — it can never join a candidate pair)
    kept_m = sorted((r.vec_id, r.cluster) for r in
                    S.semantic_dedup(vecs, threshold=0.99, n_centroids=n).collect())
    cap = S.EXPR_CENTROID_CAP
    try:
        S.EXPR_CENTROID_CAP = 10**9  # force the expression path at n centroids
        kept_e = sorted((r.vec_id, r.cluster) for r in
                        S.semantic_dedup(vecs, threshold=0.99, n_centroids=n).collect())
    finally:
        S.EXPR_CENTROID_CAP = cap
    assert kept_m == kept_e
    # the NULL row survives in the smallest-id cluster — the expression
    # forest's all-NULL-dot tie behavior, reproduced by the matrix fill
    assert (120, 0) in kept_m


def test_bpe_encode_oracle_agrees_on_early_exhaustion(spark):
    """code-review r13 #2: a vocabulary that exhausts before round k made
    the oracle's cross-join chain empty while Spark applied the shorter
    merge list.  Pin both sides equal on an exhausting corpus (all words
    fully merge within 2 of the 8 rounds)."""
    from amazon_kinesis_data_analytics_flinktableapi_spark.queries import REGISTRY
    from tests.oracle_util import compare

    import duckdb

    d = tempfile.mkdtemp(prefix="bpe_exhaust_")
    texts = ["ab ab a", "ab b a", "a b", None]
    pdf = pd.DataFrame(
        {
            "doc_id": pd.array(range(len(texts)), dtype="int64"),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s0"] * len(texts),
            "n_chars": pd.array([len(t) if t else 0 for t in texts], dtype="int64"),
        }
    )
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                   os.path.join(d, "documents.parquet"))
    spec = REGISTRY["bpe_encode_token_counts"]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    sdf = spec.fn(spark, d)
    assert sdf.count() > 0  # Spark side emits rows after the early break
    compare(sdf, con, spec.oracle)
    # and the train table itself stops early, in agreement with the oracle
    train = REGISTRY["bpe_train_merges"]
    tdf = train.fn(spark, d)
    assert tdf.count() < 8
    compare(tdf, con, train.oracle)

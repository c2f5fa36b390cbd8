"""End-to-end training-data pipeline demo: the engine used as a library.

Reads the synthetic documents table, runs the cleaning ladder (quality →
language → exact dedup → near-dup clustering → canonical selection),
packs the survivors into fixed-length training sequences, and writes a
partitioned parquet corpus — printing stage-by-stage accounting.

Run:  python examples/pipeline_demo.py [sf_dir] [out_dir]

Every stage is a declarative DataFrame op from the library; Catalyst fuses
the scan-side filters into one pass, and the only shuffles are the dedup
fingerprint groupBy, the cluster propagation, and the packing range
partition — the same plan this pipeline would run on a 1000-executor
cluster at 100 TB.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="corpus_out_")

    from amazon_kinesis_data_analytics_flinktableapi_spark.engine import build_spark
    from amazon_kinesis_data_analytics_flinktableapi_spark.functions.text import (
        fingerprint,
        lang_id,
        quality_score,
        token_count,
    )
    from amazon_kinesis_data_analytics_flinktableapi_spark.operators.components import dedup_clusters
    from amazon_kinesis_data_analytics_flinktableapi_spark.operators.dedup import (
        dedup_exact,
        jaccard_pairs,
    )
    from amazon_kinesis_data_analytics_flinktableapi_spark.operators.ranking import (
        global_running_sum,
    )
    from amazon_kinesis_data_analytics_flinktableapi_spark.sources.batch import read_table

    spark = build_spark(app_name="pipeline_demo", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")

    docs = read_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. scan-side quality + language filters (fused into the scan)
    scored = docs.select(
        "doc_id", "text",
        quality_score("text").alias("quality"),
        lang_id("text").alias("plang"),
    )
    kept = scored.filter((F.col("quality") >= 0.5) & (F.col("plang") == "en"))
    n1 = kept.count()

    # 2. exact dedup on the order-invariant content fingerprint
    keyed = kept.select("doc_id", "text", "quality", fingerprint("text").alias("fp"))
    exact = dedup_exact(keyed, "doc_id", key=["fp"])
    n2 = exact.count()

    # 3. near-dup clustering: jaccard pairs -> connected components ->
    #    keep each cluster's minimum doc_id
    pairs = jaccard_pairs(exact, "doc_id", "text", n=3, threshold=0.5, max_df="auto")
    clusters = dedup_clusters(pairs, exact, "doc_id")
    canonical = (
        exact.join(clusters, "doc_id")
        .filter(F.col("doc_id") == F.col("cluster_id"))
        .select("doc_id", "text", "quality")
    )
    n3 = canonical.count()

    # 4. pack into 512-token training sequences: global token prefix sum
    #    (range-partitioned — no single-partition sort), sequence id = cum div 512
    with_tokens = canonical.select(
        "doc_id", "text", token_count("text").cast("bigint").alias("n_tokens")
    )
    packed = global_running_sum(
        with_tokens, order_by=[F.asc("doc_id")], value_col="n_tokens", sum_name="cum"
    ).select(
        "doc_id", "text", "n_tokens", F.expr("(cum - n_tokens) div 512").alias("seq_id")
    )

    # 5. write the corpus partitioned by sequence bucket (directory pruning
    #    for downstream readers)
    packed.withColumn("seq_bucket", F.col("seq_id") % 16).write.mode(
        "overwrite"
    ).partitionBy("seq_bucket").parquet(out_dir)
    n4 = spark.read.parquet(out_dir).count()

    print(f"input docs:            {n0}")
    print(f"after quality+lang:    {n1}")
    print(f"after exact dedup:     {n2}")
    print(f"after near-dup:        {n3}")
    print(f"packed rows written:   {n4}  ->  {out_dir}")
    spark.stop()


if __name__ == "__main__":
    main()

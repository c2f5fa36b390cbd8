"""Subprocess body for the sink exactly-once-under-task-retry tests.

Runs in its OWN SparkSession on ``local[4, 2]`` (maxFailures=2) so Spark
genuinely re-runs the poisoned write tasks — the main test suite stays on
plain local mode (maxFailures=1) where any task failure is loud, instead
of every test silently absorbing one retry.  Invoked by
``tests/test_kinesis_sim.py`` via ``python -m tests.fault_retry_runner
<workdir>``; prints one JSON line with the evidence the host test asserts
on, or exits nonzero with a traceback.
"""

from __future__ import annotations

import glob
import json
import os
import sys


def _manifest_rows(path: str) -> tuple[list[dict], list[str]]:
    """All committed (manifest-referenced) JSONL rows + manifest file list."""
    rows, files = [], []
    for mpath in sorted(glob.glob(os.path.join(path, "batch=*", "_manifest.json"))):
        for m in json.load(open(mpath)):
            files.append(m["file"])
            rows += [json.loads(line) for line in open(m["file"]) if line]
    return rows, files


def main(workdir: str) -> dict:
    from pyspark.sql import functions as F

    from amazon_kinesis_data_analytics_flinktableapi_spark.engine import build_spark
    from amazon_kinesis_data_analytics_flinktableapi_spark.sources.kinesis_sim import register

    spark = build_spark(
        app_name="fault-retry", master="local[4, 2]", shuffle_partitions=4
    )
    spark.sparkContext.setLogLevel("ERROR")
    register(spark)
    out: dict = {}

    # --- batch writer ------------------------------------------------------
    df = spark.range(200).select(F.col("id"), (F.col("id") * 3).alias("v")).repartition(4)

    def run_batch(path: str, **extra):
        (
            df.write.format("kinesis_sim")
            .option("path", path)
            .option("partition_key_col", "id")
            .option("shards", "3")
            .options(**extra)
            .mode("append")
            .save()
        )
        rows, files = _manifest_rows(path)
        return sorted((r["id"], r["v"]) for r in rows), files

    clean_rows, _ = run_batch(os.path.join(workdir, "batch_clean"))
    fault_dir = os.path.join(workdir, "batch_faulty")
    fault_rows, fault_files = run_batch(fault_dir, inject_task_failure="after_stage")
    orphans = set(glob.glob(os.path.join(fault_dir, ".uncommitted", "*")))
    out["batch"] = {
        "rows_equal": fault_rows == clean_rows,
        "n_rows": len(fault_rows),
        "expected_rows": fault_rows == [(i, 3 * i) for i in range(200)],
        "orphans_exist": bool(orphans),
        "orphans_in_manifest": bool(orphans & set(fault_files)),
    }

    # --- streaming writer ----------------------------------------------------
    def run_stream(path: str, ckpt: str, **extra):
        src = (
            spark.readStream.format("kinesis_sim")
            .options(shards=2, records_per_shard=30, batch_records=10, template="orders")
            .load()
        )
        q = (
            src.writeStream.format("kinesis_sim")
            .option("path", path)
            .option("partition_key_col", "partition_key")
            .option("shards", "3")
            .options(**extra)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows, _files = _manifest_rows(path)
        return sorted(json.loads(r["data"])["id"] for r in rows)

    clean_ids = run_stream(
        os.path.join(workdir, "stream_clean"), os.path.join(workdir, "ckpt_clean")
    )
    sf_dir = os.path.join(workdir, "stream_faulty")
    fault_ids = run_stream(
        sf_dir,
        os.path.join(workdir, "ckpt_fault"),
        inject_task_failure="after_stage",
    )
    out["stream"] = {
        "ids_equal": fault_ids == clean_ids,
        "n_ids": len(fault_ids),
        "ids_unique": len(set(fault_ids)) == len(fault_ids),
        "orphans_exist": bool(glob.glob(os.path.join(sf_dir, ".uncommitted", "*"))),
    }
    spark.stop()
    return out


if __name__ == "__main__":
    print(json.dumps(main(sys.argv[1])))

"""Batch sink contracts: partition pruning on partitioned output, and
exchange-free joins on bucketed tables."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from amazon_kinesis_data_analytics_flinktableapi_spark.plans import explain_str
from amazon_kinesis_data_analytics_flinktableapi_spark.sinks.batch import (
    write_bucketed_table,
    write_parquet,
)
from amazon_kinesis_data_analytics_flinktableapi_spark.sources.batch import read_table
from tests.conftest import SF_SMOKE


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    ev = read_table(spark, SF_SMOKE, "events")
    out = str(tmp_path / "ev_part")
    write_parquet(ev, out, partition_by=["event_type"])
    back = spark.read.parquet(out).filter(F.col("event_type") == "click")
    assert back.count() == ev.filter(F.col("event_type") == "click").count()
    plan = explain_str(back)
    # partition pruning: the filter must land in PartitionFilters, not as a
    # post-scan Filter over all partitions
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]


def test_bucketed_join_skips_exchange(spark, tmp_path):
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast
    try:
        ev = read_table(spark, SF_SMOKE, "events")
        left = ev.select("event_id", "user_id", "value")
        right = ev.select("event_id", "event_type")
        write_bucketed_table(left, "ev_left_b", ["event_id"], n_buckets=4, sort_by=["event_id"])
        write_bucketed_table(right, "ev_right_b", ["event_id"], n_buckets=4, sort_by=["event_id"])
        j = spark.table("ev_left_b").join(spark.table("ev_right_b"), "event_id")
        plan = explain_str(j)
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        assert j.count() == ev.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS ev_left_b")
        spark.sql("DROP TABLE IF EXISTS ev_right_b")


def test_foreach_batch_parquet_idempotent(spark, tmp_path):
    from amazon_kinesis_data_analytics_flinktableapi_spark.schemas import EVENTS_SCHEMA
    from amazon_kinesis_data_analytics_flinktableapi_spark.sinks.foreach_batch import (
        write_stream_foreach_batch_parquet,
    )
    from amazon_kinesis_data_analytics_flinktableapi_spark.sources.batch import read_table
    from amazon_kinesis_data_analytics_flinktableapi_spark.streaming.replay import replay_stream

    ev = read_table(spark, SF_SMOKE, "events").select("event_id", "ts", "user_id", "event_type", "value")
    stream = replay_stream(
        spark, ev, EVENTS_SCHEMA, str(tmp_path / "in"), n_chunks=3, order_col="ts",
        max_files_per_trigger=1,
    ).select("event_id", "user_id", "event_type", "value")
    seen_batches = []
    q = write_stream_foreach_batch_parquet(
        stream, str(tmp_path / "out"), str(tmp_path / "ckpt"),
        extra_sinks=[lambda bdf, bid: seen_batches.append((bid, bdf.count()))],
    )
    q.awaitTermination(120)

    out = spark.read.option("basePath", str(tmp_path / "out")).parquet(str(tmp_path / "out"))
    assert out.count() == ev.count()
    assert len(seen_batches) >= 2  # maxFilesPerTrigger=1 over 3 chunks
    assert sum(n for _, n in seen_batches) == ev.count()
    assert sorted(r.event_id for r in out.collect()) == sorted(r.event_id for r in ev.collect())

    # idempotence: re-writing a batch_id directory replaces, never appends
    # (materialize first — can't lazily read and overwrite the same dir)
    first_bid = seen_batches[0][0]
    replay_rows = out.filter(out.batch_id == first_bid).drop("batch_id").collect()
    replay = spark.createDataFrame(replay_rows, out.drop("batch_id").schema)
    replay.write.mode("overwrite").parquet(str(tmp_path / "out" / f"batch_id={first_bid}"))
    again = spark.read.option("basePath", str(tmp_path / "out")).parquet(str(tmp_path / "out"))
    assert again.count() == ev.count()


def test_compact_parquet_small_files(spark, tmp_path):
    from amazon_kinesis_data_analytics_flinktableapi_spark.operators.maintenance import compact_parquet
    from amazon_kinesis_data_analytics_flinktableapi_spark.sources.batch import read_table

    ev = read_table(spark, "/root/testdata/sf0.001", "events")
    src = str(tmp_path / "fragmented")
    # simulate a streaming sink's fine-grained output: 64 tiny files
    ev.repartition(64).write.parquet(src)
    n_src = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    assert n_src >= 32

    dst = str(tmp_path / "compacted")
    compact_parquet(spark, src, dst, target_file_mb=128)
    n_dst = len([f for f in os.listdir(dst) if f.endswith(".parquet")])
    assert n_dst < n_src / 8
    # content preserved exactly
    assert spark.read.parquet(dst).count() == ev.count()
    assert spark.read.parquet(dst).exceptAll(ev).count() == 0


def test_kafka_builder_wiring(spark):
    """Kafka source/sink option builders and the record-shape projection,
    asserted without a broker (e2e is env-blocked; the wiring is not)."""
    from amazon_kinesis_data_analytics_flinktableapi_spark.sinks.json_sink import kafka_payload, kafka_sink_options
    from amazon_kinesis_data_analytics_flinktableapi_spark.sources.streaming import kafka_source_options

    so = kafka_source_options("b1:9092,b2:9092", "orders")
    assert so == {
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        "subscribe": "orders",
        "startingOffsets": "latest",  # reference: LATEST initial position
    }
    assert kafka_source_options("b:9092", "t", "earliest")["startingOffsets"] == "earliest"

    ko = kafka_sink_options("b:9092", "results", "/tmp/ckpt")
    assert ko == {
        "kafka.bootstrap.servers": "b:9092",
        "topic": "results",
        "checkpointLocation": "/tmp/ckpt",
    }

    df = spark.range(3).select(F.col("id"), (F.col("id") * 2).alias("v"))
    plain = kafka_payload(df)
    assert plain.columns == ["value"]
    keyed = kafka_payload(df, fixed_key="0")
    assert keyed.columns == ["value", "key"]
    rows = keyed.collect()
    assert all(r["key"] == "0" for r in rows)  # reference fixed shard key
    assert all(r["value"].startswith("{") for r in rows)

"""JSON append sinks (K1-K3).

The reference serializes each Result POJO with Jackson and, on serialize
error, emits an **empty byte[]** rather than failing the job
(StreamingJob.java:110-125 — swallow, don't fail).  On the engine side
``to_json`` over declared Catalyst types CANNOT fail per-row the way
Jackson can (there is no reflection step), so the byte-level K1 swallow
lives where bytes are actually produced: the ``kinesis_sim`` sink writer
wraps its payload encode in try/except and emits the empty record
(sources/kinesis_sim.py, ``_KinesisSimWriterBase.write``).
``serialize_json`` contributes the schema-level half of the policy:
NULL *fields* serialize as absent/null members, never a failed task.

The reference writes every record with **fixed partition key "0"** to a
single shard, making output totally ordered (StreamingJob.java:127).  On
Spark that maps to a constant Kafka key / ``coalesce(1)`` for file output
— supported but deliberately opt-in (``single_partition=True``), because a
single output partition is precisely what you do NOT want at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def serialize_json(df: DataFrame, value_alias: str = "value") -> DataFrame:
    """Rows → single JSON-string column in the CANONICAL wire format.

    Timestamps are normalized (NTZ → session-zone TIMESTAMP) and written
    with full microsecond precision + offset (``JSON_TS_FORMAT``) — the
    default ``to_json`` truncates to millis and emits offset-less NTZ
    strings, which the replay reader would parse to NULL; the test
    harness (streaming/replay.py) applies the identical normalization
    for exactly that reason, and the production serializer must match it
    or a dump→replay round trip silently loses sub-millisecond event
    time.  K1's byte-level error swallow lives in the kinesis_sim sink
    writer (module docstring)."""
    from amazon_kinesis_data_analytics_flinktableapi_spark.sources.batch import normalize_timestamps
    from amazon_kinesis_data_analytics_flinktableapi_spark.sources.streaming import JSON_TS_FORMAT

    df = normalize_timestamps(df)
    return df.select(
        F.to_json(F.struct(*df.columns), {"timestampFormat": JSON_TS_FORMAT}).alias(value_alias)
    )


def write_stream_json(
    df: DataFrame,
    path: str,
    checkpoint: str,
    single_partition: bool = False,
    trigger_available_now: bool = False,
) -> StreamingQuery:
    """Append-mode JSON-lines file sink with checkpointing (K2+K3+Q6).

    Spark validates append-only-ness here exactly where the reference's
    ``toAppendStream`` did — a non-append query raises AnalysisException
    at start().  Timestamps land in the canonical wire format (micros +
    offset) so the documented dump→``file_replay`` round trip is
    precision-lossless (the file sink's default format truncates to
    millis).
    """
    from amazon_kinesis_data_analytics_flinktableapi_spark.sources.batch import normalize_timestamps
    from amazon_kinesis_data_analytics_flinktableapi_spark.sources.streaming import JSON_TS_FORMAT

    out = normalize_timestamps(df)
    out = out.coalesce(1) if single_partition else out
    writer = out.writeStream.format("json").option("path", path).option(
        "checkpointLocation", checkpoint
    ).option("timestampFormat", JSON_TS_FORMAT).outputMode("append")
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def kafka_sink_options(brokers: str, topic: str, checkpoint: str) -> dict[str, str]:
    """The Kafka sink's option set, exposed as data so wiring is testable
    without a broker (mirrors the reference's producer config,
    StreamingJob.java:110-130)."""
    return {
        "kafka.bootstrap.servers": brokers,
        "topic": topic,
        "checkpointLocation": checkpoint,
    }


def kafka_payload(df: DataFrame, fixed_key: str | None = None) -> DataFrame:
    """Project rows to the Kafka record shape: a ``value`` JSON column,
    plus a constant ``key`` when ``fixed_key`` is set (the reference's
    fixed partition key "0" — total order via a single shard)."""
    payload = serialize_json(df)
    if fixed_key is not None:
        payload = payload.withColumn("key", F.lit(fixed_key))
    return payload


def write_stream_kafka(
    df: DataFrame,
    brokers: str,
    topic: str,
    checkpoint: str,
    fixed_key: str | None = None,
) -> StreamingQuery:
    """Kafka JSON sink; ``fixed_key="0"`` replicates the reference's
    single-shard totally-ordered output."""
    return (
        kafka_payload(df, fixed_key)
        .writeStream.format("kafka")
        .options(**kafka_sink_options(brokers, topic, checkpoint))
        .outputMode("append")
        .start()
    )


def write_stream_memory(df: DataFrame, name: str, available_now: bool = True) -> StreamingQuery:
    """In-memory table sink (tests): query results land in ``spark.table(name)``."""
    writer = df.writeStream.format("memory").queryName(name).outputMode("append")
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

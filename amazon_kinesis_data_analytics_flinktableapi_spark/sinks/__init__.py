"""Sink registry (SURVEY.md §2 K1-K3): append-stream output with the
reference's serialization policy."""

from amazon_kinesis_data_analytics_flinktableapi_spark.sinks.json_sink import (
    serialize_json,
    write_stream_json,
    write_stream_kafka,
    write_stream_memory,
)

__all__ = ["serialize_json", "write_stream_json", "write_stream_kafka", "write_stream_memory"]

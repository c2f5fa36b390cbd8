"""Source registry: batch (parquet/JSON/CSV) + streaming (file-replay,
Kafka, rate, memory) — replaces the reference's FlinkKinesisConsumer +
JsonNodeDeserializationSchema layer (SURVEY.md §2 S1-S3)."""

from amazon_kinesis_data_analytics_flinktableapi_spark.sources.batch import read_table

__all__ = ["read_table"]

"""PySpark-native analytics engine with the query and data-processing
capabilities of ``aws-samples/amazon-kinesis-data-analytics-flinktableapi``.

The reference (surveyed in SURVEY.md) is a Flink Table API streaming app:
JSON stream sources -> typed records -> event-time watermarks -> dynamic
tables -> continuous SQL (stream-stream LEFT OUTER interval join + scalar
UDF + expression projection) -> append-only JSON sink.

This package re-expresses that capability surface Spark-first:

- ``engine``      : TableEngine — SparkSession bootstrap, catalog, SQL entry,
                    UDF registration facade (EP1-EP3 in SURVEY.md §3).
- ``schemas``     : declared StructType schemas (replaces POJO reflection).
- ``sources``     : batch + streaming source registry (replaces
                    FlinkKinesisConsumer + JsonNodeDeserializationSchema).
- ``sinks``       : append-stream sink registry with the reference's JSON
                    serialize-error policy (replaces FlinkKinesisProducer).
- ``functions``   : scalar/vector/text function library incl. the reference's
                    TimestampToString UDF.
- ``operators``   : interval join, dedup (exact/minhash/simhash/jaccard),
                    similarity search, windows, multimodal — each designed
                    for 100 TB scale (partition-wise, no driver collection).
- ``streaming``   : watermarking, file-replay harness, the full reference
                    pipeline as a Structured Streaming job.
- ``plans``       : plan-inspection helpers (pushdown / broadcast asserts).
- ``queries``     : the oracle-checked query library (driver contract).
"""

from amazon_kinesis_data_analytics_flinktableapi_spark.engine import TableEngine, build_spark

__all__ = ["TableEngine", "build_spark"]

"""File-replay test harness: batch table → JSON files → stream → memory
sink, for stream==batch equivalence checks (SURVEY.md §5: the engine's
test strategy, replacing the reference's manual Kinesis Data Generator
loop).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession

from amazon_kinesis_data_analytics_flinktableapi_spark.sources.streaming import file_replay


def dump_json_chunks(df: DataFrame, out_dir: str, n_chunks: int = 1, order_col: str | None = None) -> str:
    """Write a batch DataFrame as ``n_chunks`` JSON files named in replay
    order (chunk index = event-time order when ``order_col`` given), so a
    maxFilesPerTrigger=1 stream sees data arrive roughly in time order."""
    os.makedirs(out_dir, exist_ok=True)
    from pyspark.sql import functions as F

    from amazon_kinesis_data_analytics_flinktableapi_spark.sources.streaming import JSON_TS_FORMAT

    from amazon_kinesis_data_analytics_flinktableapi_spark.sources.batch import normalize_timestamps

    # TIMESTAMP_NTZ columns ignore to_json's timestampFormat (no offset,
    # millis only), which the replay reader would parse to NULL — cast to
    # TIMESTAMP before serializing so the wire format is always canonical
    df = normalize_timestamps(df)
    src = df.orderBy(order_col) if (order_col is not None and n_chunks > 1) else df
    # full microsecond precision — the default toJSON format truncates to
    # millis, which would corrupt event times on replay
    jcol = F.to_json(F.struct(*df.columns), {"timestampFormat": JSON_TS_FORMAT})
    rows = [r[0] for r in src.select(jcol).collect()]
    per = max(1, (len(rows) + n_chunks - 1) // n_chunks)
    for i in range(n_chunks):
        chunk = rows[i * per : (i + 1) * per]
        if not chunk:
            break
        path = os.path.join(out_dir, f"chunk-{i:05d}.json")
        with open(path, "w") as f:
            f.write("\n".join(chunk))
        # monotonically increasing mtimes so the file source lists chunks
        # in replay order
        t = 1_700_000_000 + i
        os.utime(path, (t, t))
    return out_dir


def dump_json_parts(dfs: list[DataFrame], out_dir: str) -> str:
    """Write each DataFrame in ``dfs`` as ONE JSON chunk file, named and
    mtime-ordered so a maxFilesPerTrigger=1 stream replays them as one
    micro-batch per part, in list order.  This is the out-of-order/late-data
    fixture writer: callers control exactly which rows arrive in which
    batch (``dump_json_chunks`` only splits a single table in time order)."""
    os.makedirs(out_dir, exist_ok=True)
    from pyspark.sql import functions as F

    from amazon_kinesis_data_analytics_flinktableapi_spark.sources.streaming import JSON_TS_FORMAT

    from amazon_kinesis_data_analytics_flinktableapi_spark.sources.batch import normalize_timestamps

    for i, df in enumerate(dfs):
        df = normalize_timestamps(df)
        jcol = F.to_json(F.struct(*df.columns), {"timestampFormat": JSON_TS_FORMAT})
        rows = [r[0] for r in df.select(jcol).collect()]
        path = os.path.join(out_dir, f"chunk-{i:05d}.json")
        with open(path, "w") as f:
            f.write("\n".join(rows))
        t = 1_700_000_000 + i
        os.utime(path, (t, t))
    return out_dir


def run_to_memory(
    stream_df: DataFrame,
    spark: SparkSession,
    name: str | None = None,
    timeout_sec: int = 120,
    output_mode: str = "append",
) -> DataFrame:
    """Run a streaming query to completion (availableNow) and return the
    collected result as a batch DataFrame.  ``output_mode="update"`` for
    stateful operators that can't run in append mode."""
    name = name or f"replay_{uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return spark.table(name)


def replay_stream(
    spark: SparkSession,
    batch_df: DataFrame,
    schema,
    tmp_dir: str,
    n_chunks: int = 1,
    order_col: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """batch table → JSON chunks → streaming DataFrame."""
    dump_json_chunks(batch_df, tmp_dir, n_chunks, order_col)
    return file_replay(spark, tmp_dir, schema, max_files_per_trigger)

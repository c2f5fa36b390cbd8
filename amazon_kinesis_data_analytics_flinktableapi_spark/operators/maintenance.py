"""Table maintenance: small-file compaction.

Streaming sinks and fine-grained ingestion leave directories of tiny
parquet files; at 100 TB the file-listing and per-file open overhead
dominates scans long before the bytes do.  Compaction rewrites a directory
to ~target-sized files — the no-table-format equivalent of Delta/Iceberg
``OPTIMIZE``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_file_mb: int = 128,
) -> int:
    """Rewrite ``src_dir`` parquet into ``dst_dir`` with ~``target_file_mb``
    files; returns the output file count.

    File count is sized from the ACTUAL input bytes (driver-side directory
    listing — metadata only, no data read).  The rewrite itself is one
    distributed read→repartition→write; rows are hash-distributed, so
    downstream scans see balanced files.  Compact into a NEW directory and
    swap atomically at the catalog/manifest level — in-place rewrites race
    concurrent readers.
    """
    total = 0
    for root, _dirs, files in os.walk(src_dir):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    n_files = max(1, round(total / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(src_dir)
    df.repartition(n_files).write.mode("overwrite").parquet(dst_dir)
    return n_files

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
    if not os.path.isdir(src_dir):
        # os.walk on a remote URI (s3://, hdfs://) yields nothing, which
        # would size the rewrite at total=0 → repartition(1) → one giant
        # file from a multi-TB input with no error; refuse loudly instead
        raise ValueError(
            f"compact_parquet sizes input via a driver-local listing; "
            f"{src_dir!r} is not a local directory — for remote storage, "
            "compute the byte size with the store's own listing API and "
            "repartition explicitly"
        )
    total = 0
    for root, _dirs, files in os.walk(src_dir):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    n_files = max(1, round(total / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(src_dir)
    df.repartition(n_files).write.mode("overwrite").parquet(dst_dir)
    return n_files


def zorder_sql(x: str, y: str, bits: int = 16) -> str:
    """SQL expression interleaving the low ``bits`` bits of two integer
    columns into a Z-order (Morton) key — engine-portable (pure shift/and/
    or, identical text runs on Spark SQL and DuckDB).

    Layout use: ``df.repartitionByRange(n, F.expr(zorder_sql("x","y")))``
    then write — rows close in BOTH dimensions land in the same files, so
    per-file min/max stats prune scans filtered on EITHER column (the
    no-table-format equivalent of Delta's OPTIMIZE ZORDER BY).  Pure
    expression: scan-local, zero shuffle until the layout repartition
    itself.
    """
    terms = [
        f"((({x} >> {i}) & 1) << {2 * i}) | ((({y} >> {i}) & 1) << {2 * i + 1})"
        for i in range(bits)
    ]
    return "(" + " | ".join(f"({t})" for t in terms) + ")"

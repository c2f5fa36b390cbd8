"""Global ordering without a global bottleneck.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY collapses the
whole dataset into ONE task (Catalyst plans ``Exchange SinglePartition``) —
the canonical 100 TB anti-pattern.  ``global_row_number`` produces the
identical ranking with distributed work: range-partition on the sort key,
rank locally, then add each partition's global offset (a partition-count
table of ``n_partitions`` rows, computed in one tiny aggregation).

The output is deterministic even though range boundaries are sampled:
offset + local rank == global rank for ANY boundary placement, provided
the sort key is a total order (callers must include a unique tie-break).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    order_by: list[Column],
    id_name: str = "global_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Contiguous 1-based global rank by ``order_by`` (must be a total
    order), computed without ever shuffling to a single partition.

    Scale shape: one range-repartition shuffle (sampled boundaries), one
    per-partition sort (the window below never crosses partitions), and a
    driver-side offset table of exactly ``n_partitions`` rows — the only
    data that leaves the executors.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # localCheckpoint (NOT cache) is REQUIRED for correctness, not speed:
    # repartitionByRange samples its boundaries per execution, and cached
    # blocks are best-effort — an evicted/lost block would silently
    # recompute with re-sampled boundaries and different partition ids,
    # corrupting ranks.  Checkpointing truncates lineage so recompute is
    # impossible: a lost block fails the job loudly instead.  (On a real
    # cluster prefer reliable ``checkpoint()`` or writing the ranged
    # intermediate out — the invariant is ONE pinned materialization.)
    ranged = (
        df.repartitionByRange(n, *order_by)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    # n_partitions rows — bounded by the partition count, never by |df|
    counts = sorted(
        ranged.groupBy("__pid").count().collect(), key=lambda r: r["__pid"]
    )
    offsets, acc = {}, 0
    for r in counts:
        offsets[r["__pid"]] = acc
        acc += r["count"]
    off_df = F.broadcast(
        df.sparkSession.createDataFrame(
            [(p, o) for p, o in offsets.items()], "__pid int, __offset long"
        )
    )
    w = Window.partitionBy("__pid").orderBy(*order_by)
    return (
        ranged.join(off_df, "__pid")
        .select(
            *[c for c in df.columns],
            (F.row_number().over(w) + F.col("__offset")).alias(id_name),
        )
    )


def global_running_sum(
    df: DataFrame,
    order_by: list[Column],
    value_col: str,
    sum_name: str = "running_sum",
    num_partitions: int | None = None,
) -> DataFrame:
    """End-inclusive global running sum of ``value_col`` in ``order_by``
    order (must be a total order), without ``Exchange SinglePartition``.

    Same shape as :func:`global_row_number`: range-partition on the sort
    key, per-partition prefix sums (a window that never crosses
    partitions), plus a broadcast offset table of per-partition totals —
    ``n_partitions`` rows is all that reaches the driver.  Requires an
    integer-typed ``value_col``: integer partial sums are associative and
    exact, so the result is bit-identical for ANY boundary placement
    (float partials would make the offsets order-dependent).
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # localCheckpoint REQUIRED for correctness (see global_row_number):
    # boundaries are sampled per execution; offsets and prefix sums must
    # see the SAME pinned partitioning, and cache() can't guarantee that.
    ranged = (
        df.repartitionByRange(n, *order_by)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    totals = sorted(
        ranged.groupBy("__pid").agg(F.sum(value_col).alias("__s")).collect(),
        key=lambda r: r["__pid"],
    )
    offsets, acc = {}, 0
    for r in totals:
        offsets[r["__pid"]] = acc
        # a partition whose values are all NULL sums to NULL (SQL sum
        # ignores NULLs) — it contributes 0, not a driver TypeError
        acc += r["__s"] or 0
    off_df = F.broadcast(
        df.sparkSession.createDataFrame(
            [(p, o) for p, o in offsets.items()], "__pid int, __offset long"
        )
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ranged.join(off_df, "__pid")
        .select(
            *[c for c in df.columns],
            (F.sum(value_col).over(w) + F.col("__offset")).alias(sum_name),
        )
    )

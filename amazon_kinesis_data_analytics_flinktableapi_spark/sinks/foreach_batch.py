"""foreachBatch sink: the exactly-once / multi-sink escape hatch.

Structured Streaming's built-in file sink is append-only and
single-destination.  ``foreachBatch`` hands each micro-batch to arbitrary
batch-writer code with its (replay-stable) ``batch_id`` — the standard
recipe for:

- **exactly-once to non-transactional stores**: make the write IDEMPOTENT
  on batch_id (here: one ``batch_id=N`` directory per batch, overwritten
  on replay), so the at-least-once redelivery after a failure-restart
  collapses to exactly-once output;
- **fan-out**: one stream feeding several batch sinks from the same batch
  DataFrame (persist the batch first so each sink doesn't recompute it).

Scale: the batch writer runs the full distributed write path (all
executors); only coordination happens on the driver.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def write_stream_foreach_batch_parquet(
    df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    extra_sinks: list[Callable[[DataFrame, int], None]] | None = None,
) -> StreamingQuery:
    """Stream → one parquet directory per micro-batch (``batch_id=N``),
    idempotent on replay; ``extra_sinks`` receive the same persisted batch.

    Reading ``out_dir`` with ``basePath`` recursion yields the full stream
    with ``batch_id`` as a partition column — replayed batches overwrite
    their own directory instead of appending duplicates.
    """

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        sinks = extra_sinks or []
        if sinks:
            batch_df.persist()
        try:
            batch_df.write.mode("overwrite").parquet(
                os.path.join(out_dir, f"batch_id={batch_id}")
            )
            for sink in sinks:
                sink(batch_df, batch_id)
        finally:
            if sinks:
                batch_df.unpersist()

    return (
        df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )

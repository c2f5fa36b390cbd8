"""Streaming observability (SURVEY.md §7 phase 5): per-batch throughput,
state size, and watermark tracking via StreamingQueryListener — the
engine-side replacement for the metrics the reference delegated to the
Kinesis Data Analytics console.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class BatchMetrics:
    batch_id: int
    input_rows: int
    rows_per_second: float
    state_rows: int
    watermark: str | None


@dataclass
class MetricsCollector:
    """Accumulates per-batch metrics for all queries on a session."""

    batches: list[BatchMetrics] = field(default_factory=list)

    def total_input_rows(self) -> int:
        return sum(b.input_rows for b in self.batches)

    def mean_rows_per_second(self) -> float:
        rates = [b.rows_per_second for b in self.batches if b.rows_per_second > 0]
        return sum(rates) / len(rates) if rates else 0.0

    def max_state_rows(self) -> int:
        return max((b.state_rows for b in self.batches), default=0)


class EngineQueryListener(StreamingQueryListener):
    """Attach with ``spark.streams.addListener``; read ``collector``."""

    def __init__(self) -> None:
        self.collector = MetricsCollector()
        self._index: dict[tuple, int] = {}  # (runId, batchId) → batches idx

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        state_rows = sum(op.numRowsTotal for op in p.stateOperators) if p.stateOperators else 0
        watermark = p.eventTime.get("watermark") if p.eventTime else None
        m = BatchMetrics(
            batch_id=p.batchId,
            input_rows=p.numInputRows,
            rows_per_second=p.processedRowsPerSecond or 0.0,
            state_rows=state_rows,
            watermark=watermark,
        )
        # an idle query RE-REPORTS its last batch every
        # noDataProgressEventInterval; appending each re-report would count
        # phantom batches in every per-batch series, so the same (runId,
        # batchId) updates its row in place (keeping the freshest
        # watermark) instead of appending
        key = (str(p.runId), p.batchId)
        if key in self._index:
            self.collector.batches[self._index[key]] = m
        else:
            self._index[key] = len(self.collector.batches)
            self.collector.batches.append(m)

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass


def attach(spark: SparkSession) -> EngineQueryListener:
    listener = EngineQueryListener()
    spark.streams.addListener(listener)
    return listener

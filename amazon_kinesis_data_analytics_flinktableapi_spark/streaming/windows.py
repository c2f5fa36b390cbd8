"""Streaming windowed aggregation + stateful operators (capability
completion: the Table-API surface the reference sits on exposes these even
though its one query uses none — SURVEY.md §2 coverage checklist).

All windows take event-time + watermark and run in append mode (results
emit when the watermark closes a window), matching Flink's default
event-time window firing.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _windowed_agg(
    df: DataFrame, win: Column, ts_col: str, keys: list[str], aggs: list[Column],
    watermark: str | None, prefix: str,
) -> DataFrame:
    """Shared body of the three window shapes: watermark guard, groupBy
    on the window expression + keys, flatten window bounds to
    ``{prefix}_start``/``{prefix}_end``.  NOTE the agg columns are picked
    by exclusion (``not in {"w", *keys}``) — an agg aliased identically
    to a key would be silently dropped, in every shape alike.

    ``watermark=None`` means the caller already assigned one upstream
    (chained-stateful pipelines: Spark rejects a second ``withWatermark``
    on the same stream — "Redefining watermark is disallowed")."""
    src = df.withWatermark(ts_col, watermark) if df.isStreaming and watermark is not None else df
    out = src.groupBy(win.alias("w"), *keys).agg(*aggs)
    return out.select(
        F.col("w.start").alias(f"{prefix}_start"), F.col("w.end").alias(f"{prefix}_end"),
        *[F.col(k) for k in keys],
        *[F.col(c) for c in out.columns if c not in {"w", *keys}],
    )


def tumbling_agg(
    df: DataFrame, ts_col: str, duration: str, keys: list[str], aggs: list[Column],
    watermark: str | None = "0 seconds",
) -> DataFrame:
    return _windowed_agg(df, F.window(ts_col, duration), ts_col, keys, aggs, watermark, "window")


def sliding_agg(
    df: DataFrame, ts_col: str, duration: str, slide: str, keys: list[str], aggs: list[Column],
    watermark: str = "0 seconds",
) -> DataFrame:
    return _windowed_agg(
        df, F.window(ts_col, duration, slide), ts_col, keys, aggs, watermark, "window"
    )


def session_agg(
    df: DataFrame, ts_col: str, gap: str, keys: list[str], aggs: list[Column],
    watermark: str = "0 seconds",
) -> DataFrame:
    """Session windows: rows within ``gap`` of each other merge into one
    session per key (Flink session windows ≡ Spark session_window)."""
    return _windowed_agg(
        df, F.session_window(ts_col, gap), ts_col, keys, aggs, watermark, "session"
    )


def stream_dedup(
    df: DataFrame,
    ts_col: str,
    keys: list[str],
    watermark: str = "10 seconds",
    within_watermark: bool = False,
) -> DataFrame:
    """Streaming exact dedup within the watermark horizon.

    Default form keys state on (keys, event time): only *identical-time*
    duplicates collapse (exact replays — at-least-once source retries).
    ``within_watermark=True`` switches to ``dropDuplicatesWithinWatermark``:
    duplicates of the same key collapse even when their event times DIFFER
    (producer retries that re-stamp), with state evicted once the watermark
    passes the first sighting + delay — the realistic dedup for retried
    ingestion, and state stays bounded either way.

    The batch fallback mirrors the REQUESTED form so stream==batch
    comparisons through this helper compare like with like: default form
    dedups on (keys, ts) in both modes; ``within_watermark=True`` falls
    back to keys-only (the batch analogue collapses re-stamped
    duplicates globally — equivalent whenever the fixture's duplicates
    fall within one watermark horizon, which the equivalence tests
    guarantee)."""
    if not df.isStreaming:
        return df.dropDuplicates(keys if within_watermark else [*keys, ts_col])
    src = df.withWatermark(ts_col, watermark)
    if within_watermark:
        return src.dropDuplicatesWithinWatermark(keys)
    return src.dropDuplicates([*keys, ts_col])


def running_aggregate(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    output_schema: str = "key string, n bigint, total double, ema double",
    alpha: float = 0.3,
) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-key running
    count/sum/EMA — the pattern for operators Spark's built-ins can't
    express (Flink's KeyedProcessFunction analogue).

    State = (n, total, ema) per key; timeout none (state lives for the
    query's lifetime — bound it with a timeout for unbounded key spaces at
    scale).

    Caller contract: rows with a NULL ``ts_col`` or NULL ``value_col``
    must be filtered upstream — an order-sensitive fold has no defined
    place for an unknown event time, and ``total += float(None)`` would
    poison the key's state with NaN forever.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        n, total, ema = state.get if state.exists else (0, 0.0, None)
        # gather the key's WHOLE micro-batch before sorting: Arrow hands a
        # >maxRecordsPerBatch group over as multiple chunks in shuffle
        # arrival order, and a per-chunk sort would make the order-
        # sensitive EMA fold nondeterministic across runs.  Memory bound =
        # one key's rows for one micro-batch (the same bound a chunk-wise
        # fold needs for state anyway at this operator's scale contract).
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            rows = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
            # (ts, value) secondary sort: a total order even under ts ties,
            # so the fp fold is reproducible across runs/engines
            ordered = rows.sort_values([ts_col, value_col])
            for v in ordered[value_col]:
                n += 1
                total += float(v)
                ema = float(v) if ema is None else alpha * float(v) + (1 - alpha) * ema
        state.update((n, total, ema))
        # NULL grouping keys stay NULL: str(None) would smuggle the string
        # 'None' into the key column and split the NULL group from any
        # equality the caller does downstream
        k = key[0] if key[0] is None else str(key[0])
        yield pd.DataFrame([{"key": k, "n": n, "total": total, "ema": ema}])

    return (
        df.groupBy(F.col(key_col))
        .applyInPandasWithState(
            update,
            outputStructType=output_schema,
            stateStructType="n bigint, total double, ema double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

"""Streaming correctness: the dynamic-table contract — a streaming query
over a replayed table must produce the same rows as the identical batch
query (the equivalence both Flink Table API and Structured Streaming are
built on; SURVEY.md §5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amazon_kinesis_data_analytics_flinktableapi_spark.schemas import (
    EVENTS_SCHEMA,
    EXCHANGE_RATE_SCHEMA,
    ORDER_SCHEMA,
)
from amazon_kinesis_data_analytics_flinktableapi_spark.sinks import serialize_json
from amazon_kinesis_data_analytics_flinktableapi_spark.sources.batch import read_table
from amazon_kinesis_data_analytics_flinktableapi_spark.streaming.pipeline import build_reference_query
from amazon_kinesis_data_analytics_flinktableapi_spark.streaming.replay import replay_stream, run_to_memory
from amazon_kinesis_data_analytics_flinktableapi_spark.streaming.windows import (
    running_aggregate,
    session_agg,
    stream_dedup,
    tumbling_agg,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events(spark):
    return read_table(spark, SF_SMOKE, "events").cache()


def _orders_role(events):
    return events.select(
        F.col("event_id").cast("int").alias("id"),
        F.col("ts").alias("orderTime"),
        F.floor(F.col("value") * 100).cast("int").alias("amount"),
        F.col("event_type").alias("currency"),
    )


def _rates_role(events):
    return events.filter(F.col("event_id") % 17 == 0).select(
        F.col("ts").alias("exchangeRateTime"),
        F.col("event_type").alias("currency"),
        (F.floor(F.col("value")).cast("int") % 97 + 2).alias("rate"),
    )


def rows_set(df):
    return {tuple(r) for r in df.collect()}


def test_reference_pipeline_stream_equals_batch(spark, events, tmp_path):
    """The centerpiece: streaming interval join over file replay ==
    batch interval join over the same data (matched + NULL rows both)."""
    orders_b, rates_b = _orders_role(events), _rates_role(events)
    batch = build_reference_query(spark, orders_b, rates_b, interval="1 hour")
    expected = rows_set(batch)

    orders_s = replay_stream(spark, orders_b, ORDER_SCHEMA, str(tmp_path / "orders"))
    rates_s = replay_stream(spark, rates_b, EXCHANGE_RATE_SCHEMA, str(tmp_path / "rates"))
    streamed = build_reference_query(spark, orders_s, rates_s, interval="1 hour")
    got = rows_set(run_to_memory(streamed, spark))

    matched_expected = {r for r in expected if r[3] is not None}
    matched_got = {r for r in got if r[3] is not None}
    assert matched_got == matched_expected
    # outer NULL rows: every one the batch produces must eventually emit,
    # allowing only the watermark-tail rows (orders in the final interval
    # whose window the terminal watermark cannot close) to be outstanding
    null_expected = expected - matched_expected
    null_got = got - matched_got
    assert null_got <= null_expected
    missing = null_expected - null_got
    assert len(missing) <= max(1, len(null_expected) // 10), (
        f"too many unfired outer rows: {len(missing)}/{len(null_expected)}"
    )


def test_multi_batch_replay_interval_join(spark, events, tmp_path):
    """Replay in 5 time-ordered chunks (watermark advances per batch):
    matched results must still equal batch exactly."""
    orders_b, rates_b = _orders_role(events), _rates_role(events)
    batch = build_reference_query(spark, orders_b, rates_b, interval="1 hour")
    expected = {r for r in rows_set(batch) if r[3] is not None}

    orders_s = replay_stream(
        spark, orders_b, ORDER_SCHEMA, str(tmp_path / "o5"), n_chunks=5,
        order_col="orderTime", max_files_per_trigger=1,
    )
    rates_s = replay_stream(spark, rates_b, EXCHANGE_RATE_SCHEMA, str(tmp_path / "r5"))
    streamed = build_reference_query(spark, orders_s, rates_s, interval="1 hour")
    got = {r for r in rows_set(run_to_memory(streamed, spark)) if r[3] is not None}
    assert got == expected


def test_tumbling_window_stream_equals_batch(spark, events, tmp_path):
    stream = replay_stream(spark, events, EVENTS_SCHEMA, str(tmp_path / "ev"))
    aggs = [F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total")]
    got = run_to_memory(tumbling_agg(stream, "ts", "1 hour", ["event_type"], aggs), spark)
    want = tumbling_agg(events, "ts", "1 hour", ["event_type"], aggs)
    # append mode can hold back the final (unclosed) window per key
    got_s, want_s = rows_set(got), rows_set(want)
    assert got_s <= want_s
    assert len(want_s - got_s) <= 5 * 2  # ≤ one tail window per event_type
    assert len(got_s) > 0


def test_session_window_batch(spark, events):
    aggs = [F.count(F.lit(1)).alias("n")]
    out = session_agg(events.limit(200), "ts", "30 minutes", ["user_id"], aggs)
    rows = out.collect()
    assert len(rows) > 0
    assert all(r.session_end > r.session_start for r in rows)


def test_sliding_window_stream(spark, events, tmp_path):
    from amazon_kinesis_data_analytics_flinktableapi_spark.streaming.windows import sliding_agg

    stream = replay_stream(spark, events, EVENTS_SCHEMA, str(tmp_path / "slide"))
    aggs = [F.count(F.lit(1)).alias("n")]
    got = run_to_memory(sliding_agg(stream, "ts", "2 hours", "1 hour", ["event_type"], aggs), spark)
    want = sliding_agg(events, "ts", "2 hours", "1 hour", ["event_type"], aggs)
    got_s, want_s = rows_set(got), rows_set(want)
    assert got_s <= want_s and len(got_s) > 0
    # every event lands in 2 overlapping windows; only per-key tail windows
    # (unclosed at terminal watermark) may be withheld
    assert len(want_s - got_s) <= 5 * 2


def test_session_window_stream(spark, events, tmp_path):
    small = events.filter(F.col("user_id") < 10).select("user_id", "ts", "value")
    stream = replay_stream(spark, small, "user_id long, ts timestamp, value double", str(tmp_path / "sess"))
    aggs = [F.count(F.lit(1)).alias("n")]
    got = run_to_memory(session_agg(stream, "ts", "30 minutes", ["user_id"], aggs), spark)
    want = session_agg(small, "ts", "30 minutes", ["user_id"], aggs)
    got_s, want_s = rows_set(got), rows_set(want)
    assert got_s <= want_s and len(got_s) > 0
    assert len(want_s - got_s) <= 10  # ≤ one open tail session per user


def test_stream_dedup(spark, events, tmp_path):
    dup = events.select("event_id", "ts", "event_type").union(
        events.select("event_id", "ts", "event_type")
    )
    stream = replay_stream(
        spark, dup, "event_id long, ts timestamp, event_type string", str(tmp_path / "dup")
    )
    out = run_to_memory(stream_dedup(stream, "ts", ["event_id"]), spark)
    n = out.count()
    assert n == events.count(), f"dedup kept {n} rows"


def test_append_mode_rejects_updating_query(spark, events, tmp_path):
    """Q6: non-append queries must fail fast, like toAppendStream."""
    from pyspark.errors.exceptions.captured import AnalysisException

    stream = replay_stream(spark, events, EVENTS_SCHEMA, str(tmp_path / "bad"))
    updating = stream.groupBy("event_type").count()  # no watermark/window
    with pytest.raises(AnalysisException):
        run_to_memory(updating, spark)


def test_checkpoint_restart_no_duplicates(spark, events, tmp_path):
    """K3/exactly-once: restarting a completed query from its checkpoint
    must not re-emit rows."""
    import glob

    from amazon_kinesis_data_analytics_flinktableapi_spark.sinks import write_stream_json

    small = events.limit(200).select("event_id", "ts", "event_type")
    schema = "event_id long, ts timestamp, event_type string"
    src = str(tmp_path / "src")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run():
        stream = replay_stream(spark, small, schema, src)
        q = write_stream_json(stream, out, ckpt, trigger_available_now=True)
        q.awaitTermination(120)
        return sum(1 for f in glob.glob(f"{out}/part-*.json") for line in open(f) if line.strip())

    first = run()
    assert first == 200
    second = run()
    assert second == first, f"checkpoint restart duplicated output: {second} != {first}"


def test_serialize_json_policy(spark):
    df = spark.createDataFrame([(1, "a"), (2, None)], "id int, s string")
    vals = [r.value for r in serialize_json(df).collect()]
    assert all(v is not None for v in vals)
    assert any('"id":1' in v for v in vals)


def test_running_aggregate_stateful(spark, events, tmp_path):
    small = events.select("user_id", "ts", "value").filter(F.col("user_id") < 5)
    stream = replay_stream(
        spark, small, "user_id long, ts timestamp, value double", str(tmp_path / "state")
    )
    out = run_to_memory(
        running_aggregate(stream, "user_id", "ts", "value", output_schema="key string, n bigint, total double, ema double"),
        spark,
        output_mode="update",
    )
    # update mode re-emits per batch; keep the final row per key
    got = {r.key: r for r in out.orderBy("n").collect()}
    want = {
        str(r.user_id): r for r in small.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total")).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k].n == want[k].n
        assert abs(got[k].total - want[k].total) < 1e-6


def test_outer_null_emission_batch_boundaries(spark, tmp_path):
    """Pin EXACTLY when the left-outer NULL row emits across micro-batches
    (the Flink-vs-Spark watermark gap, SURVEY.md §7 / README.md:246):

    - Flink's ascending extractor advances watermarks per record, so an
      unmatched order's NULL row emits as soon as any stream passes it.
    - Spark advances the watermark between micro-batches, so the NULL row
      emits only in a batch AFTER the one whose data moved the watermark
      past the order's match window.
    - At end of input Flink emits a MAX_VALUE watermark and flushes every
      pending outer row; Spark's availableNow leaves the watermark at the
      last computed value — an unmatched order the final watermark never
      passed emits NOTHING.  All three behaviors asserted below.
    """
    from datetime import datetime as dt

    o_rows = [
        # chunk 0                                  # chunk 1
        (1, dt(2024, 1, 1, 10, 0), 100, "USD"),
        (2, dt(2024, 1, 1, 10, 5), 200, "EUR"),  # never matches; wm passes it
        (3, dt(2024, 1, 1, 13, 0), 300, "USD"),
        (4, dt(2024, 1, 1, 13, 5), 400, "EUR"),  # never matches; wm never passes it
    ]
    r_rows = [
        (dt(2024, 1, 1, 9, 30), "USD", 2),   # chunk 0 — matches order 1
        (dt(2024, 1, 1, 13, 0), "USD", 3),   # chunk 1 — matches order 3
    ]
    orders_b = spark.createDataFrame(o_rows, ORDER_SCHEMA)
    rates_b = spark.createDataFrame(r_rows, EXCHANGE_RATE_SCHEMA)
    orders_s = replay_stream(
        spark, orders_b, ORDER_SCHEMA, str(tmp_path / "o"),
        n_chunks=2, order_col="orderTime", max_files_per_trigger=1,
    )
    rates_s = replay_stream(
        spark, rates_b, EXCHANGE_RATE_SCHEMA, str(tmp_path / "r"),
        n_chunks=2, order_col="exchangeRateTime", max_files_per_trigger=1,
    )
    joined = build_reference_query(spark, orders_s, rates_s, interval="1 hour")

    emitted = []  # (batch_id, id, convertedAmount)

    def sink(df, batch_id):
        for r in df.collect():
            emitted.append((batch_id, r.id, r.convertedAmount))

    q = joined.writeStream.foreachBatch(sink).outputMode("append").trigger(availableNow=True).start()
    q.awaitTermination(240)

    by_id = {}
    for bid, oid, conv in emitted:
        assert oid not in by_id, f"order {oid} emitted twice: {emitted}"
        by_id[oid] = (bid, conv)

    # matches emit in the micro-batch that carries both sides' data
    assert by_id[1][1] == 200  # batch 0: chunk-0 order × chunk-0 rate
    assert by_id[3][1] == 900  # batch 1: chunk-1 order × chunk-1 rate
    assert by_id[1][0] < by_id[3][0]
    # order 2's NULL row: held while the batch-1 watermark (min(10:05, 9:30)
    # from batch 0) is behind it; emits only in a batch strictly AFTER the
    # one whose data (13:00/13:05) advanced the watermark past 10:05
    assert by_id[2][1] is None
    assert by_id[2][0] > by_id[3][0], (
        "NULL row must emit in a later batch than the watermark-advancing data"
    )
    # order 4 (13:05): the final watermark is min(13:05, 13:00) = 13:00,
    # which never passes it — Spark emits no terminal flush (Flink would)
    assert 4 not in by_id, f"order 4 should never emit under availableNow: {emitted}"


def test_stream_dedup_within_watermark_retimed_duplicates(spark, events, tmp_path):
    """Producer-retry dedup: the duplicate carries a DIFFERENT event time
    (+3 s re-stamp).  Plain (key, ts) dedup keeps both; the
    dropDuplicatesWithinWatermark form collapses them while the watermark
    holds the first sighting's state."""
    base = events.select("event_id", "ts", "event_type").limit(200)
    retimed = base.select(
        "event_id", (F.col("ts") + F.expr("INTERVAL 3 SECONDS")).alias("ts"), "event_type"
    )
    dup = base.union(retimed)
    stream = replay_stream(
        spark, dup, "event_id long, ts timestamp, event_type string",
        str(tmp_path / "dupww"), n_chunks=2, order_col="ts", max_files_per_trigger=1,
    )
    out = run_to_memory(
        stream_dedup(stream, "ts", ["event_id"], watermark="1 hour", within_watermark=True),
        spark,
    )
    n = out.count()
    assert n == base.count(), f"within-watermark dedup kept {n} rows, want {base.count()}"


def test_replay_roundtrip_no_null_ts(spark, events, tmp_path):
    """Wire-format guard: dump → file_replay must lose ZERO event times,
    whatever timestamp flavor (TIMESTAMP or TIMESTAMP_NTZ) the batch side
    carries.  Round 4 regression: NTZ columns ignore to_json's
    timestampFormat (offset-less millis output), the reader's strict
    offset-ful pattern parsed every ts to NULL, and the watermark dropped
    all rows."""
    base = events.select("event_id", "ts", "event_type").limit(300)
    for flavor in ("timestamp", "timestamp_ntz"):
        df = base.withColumn("ts", F.col("ts").cast(flavor))
        stream = replay_stream(
            spark, df, "event_id long, ts timestamp, event_type string",
            str(tmp_path / f"rt_{flavor}"),
        )
        out = run_to_memory(stream, spark)
        assert out.filter(F.col("ts").isNull()).count() == 0
        got = {(r.event_id, r.ts) for r in out.collect()}
        want = {(r.event_id, r.ts) for r in base.collect()}
        assert got == want, f"{flavor}: replayed event times drifted"

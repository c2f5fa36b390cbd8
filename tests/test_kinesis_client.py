"""Contract tests for the real-AWS-Kinesis seam (sources/kinesis_client.py).

VERDICT r6 #4: the Data Source API surface in kinesis_sim is the swap
point for a boto3-backed reader (StreamingJob.java:26-41 is the behavior
to match — LATEST/TRIM_HORIZON starts, per-shard ordering, replay by
sequence range).  These tests prove, without network or credentials,
that the generator path and the SDK-client path share offset/replay
logic: every read the connector performs yields byte-identical tuples
through both acquisition modes.
"""

from __future__ import annotations

import pytest

from amazon_kinesis_data_analytics_flinktableapi_spark.sources.kinesis_client import (
    CLIENT_FACTORIES,
    FakeSdkKinesisClient,
    KinesisClient,
    register_client_factory,
    sdk_read_range,
)
from amazon_kinesis_data_analytics_flinktableapi_spark.sources.kinesis_sim import (
    KinesisSimStreamReader,
    _Opts,
    _record,
    register,
)


# --- the fake client's own wire contract ---------------------------------


def test_fake_client_satisfies_protocol():
    assert isinstance(FakeSdkKinesisClient(), KinesisClient)


def test_fake_client_list_shards():
    c = FakeSdkKinesisClient(shards=3)
    assert [s["ShardId"] for s in c.list_shards(StreamName="x")["Shards"]] == [
        "shardId-000000000000",
        "shardId-000000000001",
        "shardId-000000000002",
    ]


def test_fake_client_iterator_types_and_pagination():
    c = FakeSdkKinesisClient(shards=1, tip=25, prepublished=10, seed=5)
    # TRIM_HORIZON starts at 0, LATEST after the prepublished backlog
    it_th = c.get_shard_iterator(
        StreamName="x", ShardId="shardId-000000000000", ShardIteratorType="TRIM_HORIZON"
    )["ShardIterator"]
    it_lt = c.get_shard_iterator(
        StreamName="x", ShardId="shardId-000000000000", ShardIteratorType="LATEST"
    )["ShardIterator"]
    r_th = c.get_records(ShardIterator=it_th, Limit=100)
    r_lt = c.get_records(ShardIterator=it_lt, Limit=100)
    assert [int(r["SequenceNumber"]) for r in r_th["Records"]] == list(range(25))
    assert [int(r["SequenceNumber"]) for r in r_lt["Records"]] == list(range(10, 25))
    # Limit pages; NextShardIterator resumes exactly where the page ended
    it = c.get_shard_iterator(
        StreamName="x",
        ShardId="shardId-000000000000",
        ShardIteratorType="AT_SEQUENCE_NUMBER",
        StartingSequenceNumber="3",
    )["ShardIterator"]
    page1 = c.get_records(ShardIterator=it, Limit=4)
    assert [int(r["SequenceNumber"]) for r in page1["Records"]] == [3, 4, 5, 6]
    page2 = c.get_records(ShardIterator=page1["NextShardIterator"], Limit=4)
    assert [int(r["SequenceNumber"]) for r in page2["Records"]] == [7, 8, 9, 10]
    # payload bytes are exactly the generator's JSON for the same (seed, shard, seq)
    want = _record("orders", 5, 0, 3, 10)
    got = page1["Records"][0]
    assert got["Data"].decode() == want[3]
    assert got["PartitionKey"] == want[2]
    assert got["ApproximateArrivalTimestamp"] == want[4]


def test_fake_client_rejects_unknowns():
    c = FakeSdkKinesisClient(shards=1)
    with pytest.raises(KeyError):
        c.get_shard_iterator(
            StreamName="x", ShardId="shardId-000000000009", ShardIteratorType="TRIM_HORIZON"
        )
    with pytest.raises(ValueError):
        c.get_shard_iterator(
            StreamName="x", ShardId="shardId-000000000000", ShardIteratorType="AT_TIMESTAMP"
        )
    with pytest.raises(ValueError):
        c.get_shard_iterator(
            StreamName="x", ShardId="shardId-000000000000", ShardIteratorType="AT_SEQUENCE_NUMBER"
        )


# --- sdk_read_range: the one function both read paths share --------------


def test_sdk_read_range_matches_generator_tuples():
    c = FakeSdkKinesisClient(shards=2, seed=9, template="rates", interval_ms=40, tip=60)
    got = sdk_read_range(c, "s", 1, 5, 17)
    want = [_record("rates", 9, 1, seq, 40) for seq in range(5, 17)]
    assert got == want


def test_sdk_read_range_short_pages_and_bounds():
    # tiny page_limit forces many NextShardIterator hops; result identical
    c = FakeSdkKinesisClient(shards=1, seed=9, tip=50)
    got = sdk_read_range(c, "s", 0, 0, 50, page_limit=7)
    assert got == [_record("orders", 9, 0, seq, 10) for seq in range(50)]
    assert c.n_calls >= 8  # actually paged
    # range past the published tip stops at the tip, no spin
    assert sdk_read_range(c, "s", 0, 45, 500) == [
        _record("orders", 9, 0, seq, 10) for seq in range(45, 50)
    ]
    assert sdk_read_range(c, "s", 0, 10, 10) == []


# --- connector parity: client_mode=sdk vs the direct generator ------------


def _collect_sorted(spark, **opts):
    df = spark.read.format("kinesis_sim").options(**{k: str(v) for k, v in opts.items()}).load()
    return sorted(tuple(r) for r in df.collect())


def test_batch_read_sdk_mode_bit_identical(spark):
    register(spark)
    base = {"shards": 3, "records_per_shard": 40, "template": "orders", "seed": 11}
    direct = _collect_sorted(spark, **base)
    via_sdk = _collect_sorted(spark, **base, client_mode="sdk")
    assert via_sdk == direct and len(direct) == 120


def test_stream_reader_sdk_mode_shares_offset_and_replay_logic():
    """The WHOLE offset model (initial position, per-batch advance, clamp
    at tip, replay-by-range) must behave identically when records arrive
    through the SDK client — same offsets AND same record bytes."""
    base = {
        "shards": 2,
        "records_per_shard": 30,
        "batch_records": 7,
        "template": "rates",
        "prepublished": 4,
        "initial_position": "LATEST",
    }
    gen = KinesisSimStreamReader(base)
    sdk = KinesisSimStreamReader({**base, "client_mode": "sdk"})
    assert gen.initialOffset() == sdk.initialOffset()
    cur_g, cur_s = gen.initialOffset(), sdk.initialOffset()
    for _ in range(6):  # walk past the tip clamp
        rows_g, cur_g = gen.read(cur_g)
        rows_s, cur_s = sdk.read(cur_s)
        assert cur_g == cur_s
        assert list(rows_g) == list(rows_s)
    assert cur_g == {"shardId-000000000000": 30, "shardId-000000000001": 30}
    # recovery replay of a committed range: identical through both paths
    start = {"shardId-000000000000": 4, "shardId-000000000001": 11}
    end = {"shardId-000000000000": 19, "shardId-000000000001": 30}
    assert list(gen.readBetweenOffsets(start, end)) == list(sdk.readBetweenOffsets(start, end))


def test_unknown_client_rejected_and_factory_registry():
    with pytest.raises(ValueError, match="unknown client"):
        _Opts({"client_mode": "sdk", "client": "no_such_backend"})
    with pytest.raises(ValueError, match="client_mode"):
        _Opts({"client_mode": "grpc"})
    # a registered third-party factory becomes reachable through options
    calls = []

    def factory(opts):
        calls.append(opts.stream_name)
        return FakeSdkKinesisClient(
            shards=opts.shards, seed=opts.seed, template=opts.template,
            interval_ms=opts.interval_ms, tip=opts.records_per_shard,
        )

    register_client_factory("test_backend", factory)
    try:
        o = _Opts(
            {
                "client_mode": "sdk",
                "client": "test_backend",
                "stream_name": "orders-prod",
                "records_per_shard": 5,
                "seed": 3,
            }
        )
        client = o.make_client()
        assert calls == ["orders-prod"]
        assert sdk_read_range(client, o.stream_name, 0, 0, 5) == [
            _record("orders", 3, 0, seq, 10) for seq in range(5)
        ]
    finally:
        CLIENT_FACTORIES.pop("test_backend", None)


def test_fake_client_at_timestamp_matches_connector_start():
    """AT_TIMESTAMP through the SDK surface lands on exactly the sequence
    the connector's own start_seq computes — the two paths share the
    inclusive ceil((t − epoch − shard_ms)/interval) contract."""
    from datetime import datetime, timezone

    opts = _Opts(
        {
            "shards": 2,
            "records_per_shard": 100,
            "interval_ms": 40,
            "initial_position": "AT_TIMESTAMP",
            "start_timestamp": "2024-01-01T00:00:01.0015",
        }
    )
    c = FakeSdkKinesisClient(shards=2, interval_ms=40, tip=100)
    for shard in range(2):
        it = c.get_shard_iterator(
            StreamName="s",
            ShardId=f"shardId-{shard:012d}",
            ShardIteratorType="AT_TIMESTAMP",
            Timestamp=datetime(2024, 1, 1, 0, 0, 1, 1500, tzinfo=timezone.utc),
        )["ShardIterator"]
        first = int(c.get_records(ShardIterator=it, Limit=1)["Records"][0]["SequenceNumber"])
        assert first == opts.start_seq(shard) == 26
    with pytest.raises(ValueError, match="Timestamp"):
        c.get_shard_iterator(
            StreamName="s", ShardId="shardId-000000000000", ShardIteratorType="AT_TIMESTAMP"
        )


class _SparseClient(FakeSdkKinesisClient):
    """Real-Kinesis behavior the fake normally skips: empty pages with a
    live NextShardIterator while the iterator traverses sparse segments."""

    def __init__(self, empty_every=2, **kw):
        super().__init__(**kw)
        self._empty_every = empty_every
        self._page_no = 0

    def get_records(self, ShardIterator: str, Limit: int = 10000) -> dict:
        self._page_no += 1
        if self._page_no % self._empty_every == 0:
            shard, seq = ShardIterator.split("|")
            behind = max(0, self.tip - int(seq)) * self.interval_ms
            return {
                "Records": [],
                "NextShardIterator": ShardIterator,  # live iterator, no progress
                "MillisBehindLatest": behind,
            }
        return super().get_records(ShardIterator=ShardIterator, Limit=Limit)


def test_sdk_read_range_survives_empty_mid_stream_pages():
    """An empty Records page with MillisBehindLatest > 0 means 'keep
    paging', not end-of-data — real GetRecords returns these routinely.
    The pre-fix loop broke on the first one and silently truncated."""
    c = _SparseClient(empty_every=2, shards=1, seed=9, tip=40)
    got = sdk_read_range(c, "s", 0, 0, 40, page_limit=5)
    assert got == [_record("orders", 9, 0, seq, 10) for seq in range(40)]
    # and a caught-up stream (empty page, MillisBehindLatest == 0) still
    # terminates instead of spinning
    assert sdk_read_range(c, "s", 0, 35, 500) == [
        _record("orders", 9, 0, seq, 10) for seq in range(35, 40)
    ]


def test_sdk_replay_of_committed_range_fails_loudly_when_unservable():
    """Exactly-once recovery: readBetweenOffsets in sdk mode must never
    silently shrink a committed range.  A backend that stops serving part
    of it (here: restart with a smaller records_per_shard, so the fake's
    tip sits inside the committed range) fails the task instead."""
    base = {"shards": 1, "records_per_shard": 100, "batch_records": 20}
    r = KinesisSimStreamReader({**base, "client_mode": "sdk"})
    start, end = {"shardId-000000000000": 40}, {"shardId-000000000000": 60}
    # healthy backend: full committed range, identical to generator mode
    gen = KinesisSimStreamReader(base)
    assert list(r.readBetweenOffsets(start, end)) == list(gen.readBetweenOffsets(start, end))
    shrunk = KinesisSimStreamReader(
        {**base, "records_per_shard": 50, "client_mode": "sdk"}
    )
    with pytest.raises(RuntimeError, match="committed range"):
        list(shrunk.readBetweenOffsets(start, end))
    # the generator path regenerates (pure function of seq) — documented
    # asymmetry: only a backend READ can be unservable
    shrunk_gen = KinesisSimStreamReader({**base, "records_per_shard": 50})
    assert len(list(shrunk_gen.readBetweenOffsets(start, end))) == 20


def test_sdk_read_range_bounds_no_progress_empty_pages():
    """A backend that returns empty pages behind the tip without ever
    advancing must fail the task loudly, not hang it forever."""

    class _Stuck(FakeSdkKinesisClient):
        def get_records(self, ShardIterator: str, Limit: int = 10000) -> dict:
            return {
                "Records": [],
                "NextShardIterator": ShardIterator,
                "MillisBehindLatest": 5000,  # claims data exists, never serves it
            }

    with pytest.raises(RuntimeError, match="not progressing"):
        sdk_read_range(_Stuck(shards=1, tip=100), "s", 0, 0, 10)


class _GapClient(FakeSdkKinesisClient):
    """Contract-violating backend whose sequence space has a hole: it
    serves dense ordinals below ``gap_start``, then jumps straight to
    ``gap_end`` (as a real opaque-sequence service would look to a broken
    adapter that skipped part of its ledger)."""

    def __init__(self, gap_start: int, gap_end: int, **kw):
        super().__init__(**kw)
        self._gap = (gap_start, gap_end)

    def get_records(self, ShardIterator: str, Limit: int = 10000) -> dict:
        shard_s, seq_s = ShardIterator.split("|")
        shard, seq = int(shard_s), int(seq_s)
        lo, hi = self._gap
        seqs = []
        cur = seq
        while len(seqs) < Limit and cur < self.tip:
            if lo <= cur < hi:
                cur = hi  # the hole: served sequence space skips straight past it
                continue
            seqs.append(cur)
            cur += 1
        records = []
        for s in seqs:
            _sid, _seq, pk, data, ts = _record(
                self.template, self.seed, shard, s, self.interval_ms
            )
            records.append(
                {
                    "SequenceNumber": str(_seq),
                    "PartitionKey": pk,
                    "Data": data.encode("utf-8"),
                    "ApproximateArrivalTimestamp": ts,
                }
            )
        nxt = cur if seqs else self.tip
        return {
            "Records": records,
            "NextShardIterator": f"{shard}|{nxt}",
            "MillisBehindLatest": max(0, self.tip - nxt) * self.interval_ms,
        }


def test_sdk_read_range_stops_when_page_skips_past_end():
    """A page whose records jump past `end` (gap in the served sequence
    space) must terminate the read immediately: sequence numbers are
    monotonic, so nothing below `end` can still arrive.  The pre-fix loop
    kept paging — cursor stayed < end, non-empty out-of-range pages reset
    the empty streak — and spun through the whole remaining stream (an
    unbounded read on a deep stream) instead of stopping."""
    # deep stream: tip is huge; the old loop would walk all of it
    c = _GapClient(gap_start=10, gap_end=10_000_000, shards=1, seed=9, tip=10_002_000)
    got = sdk_read_range(c, "s", 0, 5, 20, page_limit=3)
    assert got == [_record("orders", 9, 0, seq, 10) for seq in range(5, 10)]
    assert c.n_calls < 20  # stopped at the gap, did not walk the stream
    # and a committed-range replay over the hole fails loudly, never shrinks
    with pytest.raises(RuntimeError, match="committed range"):
        sdk_read_range(c, "s", 0, 5, 20, page_limit=3, require_complete=True)


def test_interval_ms_validated():
    with pytest.raises(ValueError, match="interval_ms"):
        _Opts({"interval_ms": 0})

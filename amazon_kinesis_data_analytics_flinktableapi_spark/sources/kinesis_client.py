"""The real-AWS-Kinesis seam: a client protocol shaped like boto3.

``kinesis_sim`` (S1, StreamingJob.java:26-41) reads records from a
deterministic in-process generator.  Swapping that generator for the AWS
SDK must not touch any Spark-facing surface — partition planning, the
{shard: next_sequence} offset model, replay-by-sequence-range recovery,
and the sink commit protocol all stay identical.  This module pins that
seam as an explicit, contract-tested interface:

- :class:`KinesisClient` — a structural protocol that is *exactly* the
  subset of ``boto3.client("kinesis")`` the connector needs
  (``list_shards`` / ``get_shard_iterator`` / ``get_records``, with
  boto3's argument names and response dict shapes).  A real boto3 client
  therefore satisfies it AS-IS — the production swap is
  ``register_client_factory("aws", lambda o: boto3.client("kinesis"))``
  plus ``client_mode=sdk, client=aws`` options; zero connector changes.
- :class:`FakeSdkKinesisClient` — the same deterministic record
  generator the direct path uses, re-served through the boto3 wire
  shape (base64-free bytes payloads, string sequence numbers, opaque
  shard-iterator tokens with pagination).  It exists so the client-
  routed read path can be driven and hash-verified WITHOUT network or
  credentials: tests/test_kinesis_client.py proves the SDK path and the
  direct generator path produce byte-identical records for every
  iterator type the connector uses.

No AWS endpoint is contacted anywhere in this repo; the ``aws`` factory
is registered only if boto3 is importable (it is not in this container),
and nothing here imports it unconditionally.
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable


@runtime_checkable
class KinesisClient(Protocol):
    """Structural subset of ``boto3.client("kinesis")`` the source needs.

    Matching boto3's names/shapes exactly is the point: the protocol is
    satisfied by a real boto3 client with no adapter layer.
    """

    def list_shards(self, StreamName: str) -> dict:  # noqa: N803 — boto3 names
        """→ ``{"Shards": [{"ShardId": "shardId-000000000000"}, ...]}``"""
        ...

    def get_shard_iterator(
        self,
        StreamName: str,  # noqa: N803
        ShardId: str,  # noqa: N803
        ShardIteratorType: str,  # noqa: N803
        StartingSequenceNumber: str | None = None,  # noqa: N803
    ) -> dict:
        """→ ``{"ShardIterator": <opaque token>}``.

        Types used by the connector: ``TRIM_HORIZON``, ``LATEST``,
        ``AT_SEQUENCE_NUMBER`` (replay-by-range recovery), and
        ``AT_TIMESTAMP`` (boto3 passes the instant as ``Timestamp=``).
        """
        ...

    def get_records(self, ShardIterator: str, Limit: int = 10000) -> dict:  # noqa: N803
        """→ ``{"Records": [{"SequenceNumber": str, "PartitionKey": str,
        "Data": bytes, "ApproximateArrivalTimestamp": datetime}, ...],
        "NextShardIterator": <token>}``."""
        ...


class FakeSdkKinesisClient:
    """Deterministic generator served through the boto3 wire shape.

    Record content is the SAME pure function of (seed, shard, seq) the
    direct path uses (``kinesis_sim._record``), so the two paths are
    bit-comparable.  Shard iterators are opaque ``"shard|seq"`` tokens;
    ``get_records`` pages ``Limit`` records at a time up to the published
    tip and returns a ``NextShardIterator`` exactly like the service.
    """

    def __init__(
        self,
        shards: int = 1,
        seed: int = 42,
        template: str = "orders",
        interval_ms: int = 10,
        tip: int = 1000,
        prepublished: int = 0,
    ):
        self.shards = shards
        self.seed = seed
        self.template = template
        self.interval_ms = interval_ms
        self.tip = tip  # records currently published per shard
        self.prepublished = prepublished  # where LATEST starts
        self.n_calls = 0  # observability for the contract tests

    # -- protocol ----------------------------------------------------------
    def list_shards(self, StreamName: str) -> dict:  # noqa: N803
        self.n_calls += 1
        return {"Shards": [{"ShardId": f"shardId-{s:012d}"} for s in range(self.shards)]}

    def get_shard_iterator(
        self,
        StreamName: str,  # noqa: N803
        ShardId: str,  # noqa: N803
        ShardIteratorType: str,  # noqa: N803
        StartingSequenceNumber: str | None = None,  # noqa: N803
        Timestamp=None,  # noqa: N803 — boto3's AT_TIMESTAMP argument
    ) -> dict:
        self.n_calls += 1
        shard = int(ShardId.rsplit("-", 1)[1])
        if not 0 <= shard < self.shards:
            raise KeyError(f"unknown shard {ShardId!r}")
        if ShardIteratorType == "TRIM_HORIZON":
            seq = 0
        elif ShardIteratorType == "LATEST":
            seq = self.prepublished
        elif ShardIteratorType == "AT_SEQUENCE_NUMBER":
            if StartingSequenceNumber is None:
                raise ValueError("AT_SEQUENCE_NUMBER requires StartingSequenceNumber")
            seq = int(StartingSequenceNumber)
        elif ShardIteratorType == "AT_TIMESTAMP":
            from .kinesis_sim import _EPOCH, _parse_start_timestamp

            if Timestamp is None:
                raise ValueError("AT_TIMESTAMP requires Timestamp")
            ts = _parse_start_timestamp(Timestamp)
            delta_us = round((ts - _EPOCH).total_seconds() * 1_000_000) - shard * 1000
            seq = 0 if delta_us <= 0 else -(-delta_us // (self.interval_ms * 1000))
        else:
            raise ValueError(f"unsupported ShardIteratorType {ShardIteratorType!r}")
        return {"ShardIterator": f"{shard}|{seq}"}

    def get_records(self, ShardIterator: str, Limit: int = 10000) -> dict:  # noqa: N803
        from .kinesis_sim import _record

        self.n_calls += 1
        shard_s, seq_s = ShardIterator.split("|")
        shard, seq = int(shard_s), int(seq_s)
        end = min(seq + Limit, self.tip)
        records = []
        for s in range(seq, end):
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
        return {"Records": records, "NextShardIterator": f"{shard}|{end}"}


def _fake_sdk_factory(opts) -> FakeSdkKinesisClient:
    """Build the fake client from a validated ``kinesis_sim`` option bag."""
    return FakeSdkKinesisClient(
        shards=opts.shards,
        seed=opts.seed,
        template=opts.template,
        interval_ms=opts.interval_ms,
        tip=opts.records_per_shard,
        prepublished=opts.prepublished,
    )


#: name → factory(validated _Opts) → KinesisClient.  Factories run on the
#: EXECUTOR (inside DataSourceReader.read), so a factory must construct its
#: client from the pickled option bag alone — no driver-side session state.
CLIENT_FACTORIES: dict[str, object] = {"fake_sdk": _fake_sdk_factory}


def register_client_factory(name: str, factory) -> None:
    """Register a client backend (e.g. ``"aws"`` → boto3) for
    ``client_mode=sdk, client=<name>`` reads.

    Executor visibility: Data Source readers run in Python WORKER
    processes that re-import this module, so a factory registered at
    driver runtime is not automatically visible there.  Register from
    module import (as the built-in ``fake_sdk`` and conditional ``aws``
    factories are) — e.g. put the ``register_client_factory`` call in a
    module shipped to executors and imported by your job — the same
    packaging rule Spark applies to UDF dependencies.  Factories must
    also build their client from the pickled option bag alone (no driver
    session state), since construction happens inside the read task.
    """
    CLIENT_FACTORIES[name] = factory


try:  # pragma: no cover — boto3 is absent in this container by design
    import boto3  # noqa: F401

    register_client_factory(
        "aws", lambda opts: boto3.client("kinesis")  # the protocol IS boto3's shape
    )
except ImportError:
    pass


def sdk_read_range(
    client: KinesisClient,
    stream_name: str,
    shard: int,
    start: int,
    end: int,
    page_limit: int = 10000,
) -> list[tuple]:
    """Read [start, end) from one shard through the SDK surface, returning
    the connector's wire tuples (shard_id, seq, partition_key, data,
    arrival_ts).

    This is the ONE function both the batch reader and the streaming
    replay path route through in ``client_mode=sdk`` — offset semantics
    (half-open ranges keyed by next-sequence-number) live here once, so
    the generator-backed fake and a real boto3 client are interchangeable
    by construction.  Pagination follows NextShardIterator; Kinesis can
    return short pages, so the loop is bounded by the *cursor*, not the
    call count.
    """
    shard_id = f"shardId-{shard:012d}"
    if end <= start:
        return []
    it = client.get_shard_iterator(
        StreamName=stream_name,
        ShardId=shard_id,
        ShardIteratorType="AT_SEQUENCE_NUMBER",
        StartingSequenceNumber=str(start),
    )["ShardIterator"]
    out: list[tuple] = []
    cursor = start
    while cursor < end and it is not None:
        resp = client.get_records(ShardIterator=it, Limit=min(page_limit, end - cursor))
        records = resp.get("Records", [])
        if not records:
            break  # tip reached before `end` — caller sized the range
        for r in records:
            seq = int(r["SequenceNumber"])
            if seq >= end:
                break
            out.append(
                (
                    shard_id,
                    seq,
                    r["PartitionKey"],
                    r["Data"].decode("utf-8"),
                    r["ApproximateArrivalTimestamp"],
                )
            )
            cursor = seq + 1
        it = resp.get("NextShardIterator")
    return out

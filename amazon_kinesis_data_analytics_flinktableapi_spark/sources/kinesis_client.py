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
  boto3's argument names and response dict shapes), so a production
  adapter is a thin wrapper around a boto3 client rather than a second
  read implementation.  One real-service delta the wrapper must own:
  the connector's offsets are DENSE ORDINALS (0, 1, 2, … per shard)
  while real Kinesis sequence numbers are opaque service-assigned
  strings and shard ids survive resharding — an ``aws`` factory
  therefore maintains the ordinal↔sequence-number mapping (e.g. a
  per-shard base sequence captured at stream attach, or a small offset
  ledger) and translates in ``get_shard_iterator``/``get_records``
  responses.  Everything else — pagination, the empty-page/
  MillisBehindLatest protocol, half-open range semantics, strict replay
  — lives once in :func:`sdk_read_range` and is contract-tested here.
- :class:`FakeSdkKinesisClient` — the same deterministic record
  generator the direct path uses, re-served through the boto3 wire
  shape (base64-free bytes payloads, string sequence numbers, opaque
  shard-iterator tokens with pagination).  It exists so the client-
  routed read path can be driven and hash-verified WITHOUT network or
  credentials: tests/test_kinesis_client.py proves the SDK path and the
  direct generator path produce byte-identical records for every
  iterator type the connector uses.

No AWS endpoint is contacted anywhere in this repo, and no ``aws``
factory ships pre-registered (a raw boto3 client needs the
ordinal-translation wrapper above) — a deployment registers its adapter
via :func:`register_client_factory`.
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable


@runtime_checkable
class KinesisClient(Protocol):
    """Structural subset of ``boto3.client("kinesis")`` the source needs.

    Matching boto3's names/shapes exactly keeps a production adapter
    thin: it wraps a boto3 client 1:1 and owns only the
    ordinal↔sequence-number translation (module docstring).
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
        Timestamp=None,  # noqa: N803 — boto3's AT_TIMESTAMP argument
    ) -> dict:
        """→ ``{"ShardIterator": <opaque token>}``.

        The connector's read loop issues only ``AT_SEQUENCE_NUMBER``
        (every read is an offset range); ``TRIM_HORIZON`` / ``LATEST`` /
        ``AT_TIMESTAMP`` (instant in ``Timestamp=``) are part of the
        contract so adapters can be parity-tested on initial-position
        resolution — see the fake client and ``_Opts.start_seq``.
        """
        ...

    def get_records(self, ShardIterator: str, Limit: int = 10000) -> dict:  # noqa: N803
        """→ ``{"Records": [{"SequenceNumber": str, "PartitionKey": str,
        "Data": bytes, "ApproximateArrivalTimestamp": datetime}, ...],
        "NextShardIterator": <token>, "MillisBehindLatest": int}``.

        ``MillisBehindLatest`` is REQUIRED (boto3 always returns it):
        ``sdk_read_range`` uses ``0`` on an empty page as the only
        end-of-available-data signal.  An adapter that omits it makes
        empty mid-stream pages look like the tip — plain reads would
        truncate silently there, and committed-range replays fail loudly
        instead (``require_complete``)."""
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
            from .kinesis_sim import seq_at_timestamp

            if Timestamp is None:
                raise ValueError("AT_TIMESTAMP requires Timestamp")
            seq = seq_at_timestamp(Timestamp, shard, self.interval_ms)
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
        for s in range(seq, max(seq, end)):
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
        behind = max(0, self.tip - max(seq, end)) * self.interval_ms
        return {
            "Records": records,
            "NextShardIterator": f"{shard}|{max(seq, end)}",
            # like the service: 0 only when the iterator is caught up to
            # the tip — the pagination-stop signal sdk_read_range keys on
            "MillisBehindLatest": behind,
        }


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


# No "aws" factory ships pre-registered: a raw boto3 client speaks the
# same wire shape but uses opaque service sequence numbers where the
# connector uses dense ordinals (module docstring) — registering it
# unadapted would fail on the first get_shard_iterator.  A deployment
# registers its wrapper (holding the ordinal↔sequence mapping) from a
# module imported on the executors; see register_client_factory.


def sdk_read_range(
    client: KinesisClient,
    stream_name: str,
    shard: int,
    start: int,
    end: int,
    page_limit: int = 10000,
    require_complete: bool = False,
) -> list[tuple]:
    """Read [start, end) from one shard through the SDK surface, returning
    the connector's wire tuples (shard_id, seq, partition_key, data,
    arrival_ts).

    This is the ONE function both the batch reader and the streaming
    replay path route through in ``client_mode=sdk`` — offset semantics
    (half-open ranges keyed by next-sequence-number) live here once, so
    the generator-backed fake and a service-backed client are
    interchangeable by construction.  Pagination follows
    NextShardIterator, bounded by the *cursor*, not the call count; an
    EMPTY page does NOT mean end-of-data (real Kinesis routinely returns
    empty pages with a live iterator while traversing aged or sparse
    stream segments) — the loop stops only at a null iterator or an
    empty page with ``MillisBehindLatest == 0`` (caught up to the tip).

    ``require_complete=True`` is the checkpoint-REPLAY contract: a
    committed range that cannot be fully served is an error (the task
    fails loudly and Spark retries), never a silent truncation — an
    exactly-once sink downstream would otherwise commit a batch missing
    rows.  Plain reads leave it False: stopping at the tip is the normal
    "that's all that exists yet" outcome.
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
    empty_streak = 0
    saw_past_end = False
    while cursor < end and it is not None and not saw_past_end:
        resp = client.get_records(ShardIterator=it, Limit=min(page_limit, end - cursor))
        records = resp.get("Records", [])
        for r in records:
            seq = int(r["SequenceNumber"])
            if seq >= end:
                # Sequence numbers are monotonic within and across pages, so
                # a record at/past `end` means nothing below `end` remains —
                # stop the WHOLE read, not just this page.  Without this, a
                # backend whose page skips past `end` (cursor still < end,
                # non-empty pages resetting empty_streak) would page forever.
                saw_past_end = True
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
        if records:
            empty_streak = 0
        else:
            if resp.get("MillisBehindLatest", 0) == 0:
                break  # caught up to the shard tip before `end`
            # empty page behind the tip = keep paging (iterator traverses
            # an aged/sparse segment) — but bound the streak so a
            # misbehaving backend that returns empty pages without ever
            # advancing fails the task instead of hanging it forever.
            # Legit aged-gap traversal advances the iterator each call;
            # 10k consecutive empties (~100M skipped positions at the
            # default Limit) is pathological.  Rate limiting / backoff
            # between pages is the adapter's concern (it owns the
            # network), not this loop's.
            empty_streak += 1
            if empty_streak >= 10_000:
                raise RuntimeError(
                    f"{shard_id}: {empty_streak} consecutive empty pages behind the "
                    f"tip without reaching sequence {end} — backend is not progressing"
                )
        it = resp.get("NextShardIterator")
    if require_complete and cursor < end:
        raise RuntimeError(
            f"replay of committed range [{start}, {end}) on {shard_id} stopped at "
            f"{cursor}: the backend no longer serves part of a committed range — "
            "failing loudly rather than silently dropping committed records"
        )
    return out

"""Property-based checks of the SDK read seam (sources/kinesis_client.py).

Two invariants, each against the generator ground truth on arbitrary
inputs:

1. ``sdk_read_range`` is insensitive to HOW a conforming backend pages —
   short pages, empty-but-progressing pages behind the tip, any
   page_limit — for any (start, end) range, including ranges past the
   tip.
2. ``TranslatingKinesisClient`` returns correct dense-ordinal ranges for
   ANY SEQUENCE of reads through one shared wrapper — the sparse ledger
   accumulates in arbitrary orders, which is exactly where a seeding bug
   (e.g. seeding past the target from a later entry) corrupts results
   silently.

Both run driver-side Python only (no Spark session), so hypothesis can
afford real example counts.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from amazon_kinesis_data_analytics_flinktableapi_spark.sources.kinesis_client import (
    FakeSdkKinesisClient,
    OpaqueSeqKinesisClient,
    TranslatingKinesisClient,
    sdk_read_range,
)
from amazon_kinesis_data_analytics_flinktableapi_spark.sources.kinesis_sim import _record


class _JitteryClient(FakeSdkKinesisClient):
    """Conforming backend with adversarial-but-legal paging: each
    get_records call may serve fewer records than asked, or an empty page
    with a live iterator while behind the tip (as real Kinesis does over
    aged/sparse segments).  Progress is forced at least every third call,
    so the no-progress guard never legitimately fires."""

    def __init__(self, jitter: list[int], **kw):
        super().__init__(**kw)
        self._jitter = jitter  # drawn by hypothesis; cycled
        self._call_no = 0
        self._empty_streak = 0

    def get_records(self, ShardIterator: str, Limit: int = 10000) -> dict:
        j = self._jitter[self._call_no % len(self._jitter)]
        self._call_no += 1
        shard, seq = (int(x) for x in ShardIterator.split("|"))
        behind_tip = seq < self.tip
        if j == 0 and behind_tip and self._empty_streak < 2:
            # legal empty page: live iterator, truthful MillisBehindLatest
            self._empty_streak += 1
            return {
                "Records": [],
                "NextShardIterator": ShardIterator,
                "MillisBehindLatest": (self.tip - seq) * self.interval_ms,
            }
        self._empty_streak = 0
        eff = max(1, min(Limit, j if j > 0 else Limit))
        return super().get_records(ShardIterator=ShardIterator, Limit=eff)


@settings(max_examples=60, deadline=None)
@given(
    tip=st.integers(min_value=0, max_value=120),
    start=st.integers(min_value=0, max_value=150),
    length=st.integers(min_value=0, max_value=150),
    page_limit=st.integers(min_value=1, max_value=50),
    jitter=st.lists(st.integers(min_value=0, max_value=7), min_size=1, max_size=12),
    seed=st.integers(min_value=0, max_value=5),
)
def test_sdk_read_range_paging_insensitive(tip, start, length, page_limit, jitter, seed):
    c = _JitteryClient(jitter, shards=1, seed=seed, tip=tip)
    end = start + length
    got = sdk_read_range(c, "s", 0, start, end, page_limit=page_limit)
    want = [_record("orders", seed, 0, q, 10) for q in range(start, min(end, tip))]
    assert got == want


@settings(max_examples=40, deadline=None)
@given(
    tip=st.integers(min_value=1, max_value=150),
    reads=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=160),
            st.integers(min_value=0, max_value=60),
            st.integers(min_value=1, max_value=40),
        ),
        min_size=1,
        max_size=8,
    ),
    seed=st.integers(min_value=0, max_value=5),
)
def test_translating_ledger_correct_for_any_read_sequence(tip, reads, seed):
    """One shared wrapper, arbitrary (start, length, page_limit) reads in
    arbitrary order: every read must equal the ground truth regardless of
    what the sparse ledger happens to contain from earlier reads."""
    c = TranslatingKinesisClient(OpaqueSeqKinesisClient(shards=1, seed=seed, tip=tip))
    for start, length, page_limit in reads:
        end = start + length
        got = sdk_read_range(c, "s", 0, start, end, page_limit=page_limit)
        want = [_record("orders", seed, 0, q, 10) for q in range(start, min(end, tip))]
        assert got == want, f"read [{start}, {end}) page_limit={page_limit}"


@given(
    shards=st.integers(1, 3),
    tip=st.integers(2, 60),
    reshard_frac=st.floats(0.05, 0.95),
    seed=st.integers(0, 2**16),
    page_limit=st.integers(1, 64),
)
@settings(max_examples=40, deadline=None)
def test_reshard_reads_match_generator_for_any_split(
    shards, tip, reshard_frac, seed, page_limit
):
    """r9 reshard model: for ANY (shards, records_per_shard, reshard_at)
    the full per-shard reads through the complete adapter stack equal the
    generator ground truth — parents truncate exactly at their closing
    sequence, children serve their own dense spaces, and no record is
    lost, duplicated, or attributed to the wrong lineage shard."""
    reshard_at = max(1, min(tip - 1, int(tip * reshard_frac)))
    from amazon_kinesis_data_analytics_flinktableapi_spark.sources.kinesis_sim import (
        shard_topology,
    )

    c = TranslatingKinesisClient(
        OpaqueSeqKinesisClient(shards=shards, seed=seed, tip=tip, reshard_at=reshard_at)
    )
    for t in shard_topology(shards, tip, reshard_at):
        # ask for MORE than the shard holds: closed parents and children
        # alike must truncate at their own tip, never fabricate
        got = sdk_read_range(c, "s", t.index, 0, tip + 7, page_limit=page_limit)
        assert got == [
            _record("orders", seed, t.index, q, 10) for q in range(t.n_records)
        ], f"shard {t.index} (parent={t.parent} closed={t.closed})"


def _draw_plan(data, shards: int, tip: int, max_events: int) -> list[dict]:
    """Grow a valid reshard plan event-by-event against the evolving
    topology — each drawn event picks its parents from the shards that
    are open AT THAT POINT in the plan, so children of earlier events are
    eligible parents and the drawn plans form genuine multi-generation
    DAGs (split of a split child, merge of two split children, merge
    child splitting again, …)."""
    from amazon_kinesis_data_analytics_flinktableapi_spark.sources.kinesis_sim import (
        apply_reshard_plan,
    )

    n_events = data.draw(st.integers(0, max_events), label="n_events")
    plan: list[dict] = []
    for _ in range(n_events):
        topo = apply_reshard_plan(shards, tip, plan)
        open_shards = [t for t in topo if not t.closed and t.n_records >= 2]
        if not open_shards:
            break
        want_merge = len(open_shards) >= 2 and data.draw(st.booleans(), label="merge?")
        if want_merge:
            a, b = data.draw(
                st.lists(
                    st.sampled_from([t.index for t in open_shards]),
                    min_size=2, max_size=2, unique=True,
                ),
                label="merge parents",
            )
            budgets = {t.index: t.n_records for t in open_shards}
            at = data.draw(
                st.integers(1, min(budgets[a], budgets[b]) - 1), label="merge at"
            )
            plan.append({"op": "merge", "parents": [a, b], "at": at})
        else:
            p = data.draw(
                st.sampled_from([t.index for t in open_shards]), label="split parent"
            )
            budget = next(t.n_records for t in open_shards if t.index == p)
            at = data.draw(st.integers(1, budget - 1), label="split at")
            plan.append({"op": "split", "parent": p, "at": at})
    return plan


@given(data=st.data())
@settings(max_examples=50, deadline=None)
def test_reshard_plan_reads_match_generator_for_any_plan(data):
    """r10 multi-generation model: for ANY valid reshard plan of up to 4
    events (any split/merge mix — including events whose parents are
    children of earlier events, i.e. chains 3+ generations deep) every
    lineage shard read through the complete opaque→dense adapter stack
    equals the generator ground truth, with require_complete proving the
    checkpoint-replay contract on closed ranges."""
    from amazon_kinesis_data_analytics_flinktableapi_spark.sources.kinesis_sim import (
        apply_reshard_plan,
    )

    shards = data.draw(st.integers(2, 3), label="shards")
    tip = data.draw(st.integers(4, 48), label="tip")
    seed = data.draw(st.integers(0, 2**16), label="seed")
    page_limit = data.draw(st.integers(1, 64), label="page_limit")
    plan = _draw_plan(data, shards, tip, max_events=4)

    from amazon_kinesis_data_analytics_flinktableapi_spark.sources.kinesis_client import (
        OpaqueSeqKinesisClient,
        TranslatingKinesisClient,
        sdk_read_range as _read,
    )

    c = TranslatingKinesisClient(
        OpaqueSeqKinesisClient(shards=shards, seed=seed, tip=tip, reshard_plan=plan)
    )
    for t in apply_reshard_plan(shards, tip, plan):
        # over-ask: every shard truncates at its own tip, never fabricates
        got = _read(c, "s", t.index, 0, t.n_records + 5, page_limit=page_limit)
        assert got == [
            _record("orders", seed, t.index, q, 10) for q in range(t.n_records)
        ], f"plan={plan} shard={t.index}"
        # the full range itself replays complete (checkpoint contract)
        assert (
            len(
                _read(
                    c, "s", t.index, 0, t.n_records,
                    page_limit=page_limit, require_complete=True,
                )
            )
            == t.n_records
        )


@given(data=st.data())
@settings(max_examples=25, deadline=None)
def test_lineage_order_strict_parent_before_child_for_any_plan(data):
    """r10 ``lineage_order=strict`` as an OUTPUT property, not an
    implementation echo: for ANY valid reshard plan of up to 4 events,
    drive the streaming reader to exhaustion and record which batch each
    record arrived in — every shard with lineage must see its first
    record in a LATER batch than the last record of every one of its
    parents (the service consumer's parent-before-child contract,
    transitive across generations), and the total multiset must equal
    the topology."""
    from amazon_kinesis_data_analytics_flinktableapi_spark.sources.kinesis_sim import (
        KinesisSimStreamReader,
        apply_reshard_plan,
    )

    shards = data.draw(st.integers(1, 3), label="shards")
    tip = data.draw(st.integers(4, 24), label="tip")
    batch_records = data.draw(st.integers(1, 7), label="batch_records")
    plan = _draw_plan(data, shards, tip, max_events=4)

    import json as _json

    r = KinesisSimStreamReader(
        {
            "shards": shards, "records_per_shard": tip, "seed": 7,
            "batch_records": batch_records, "lineage_order": "strict",
            **({"reshard_plan": _json.dumps(plan)} if plan else {}),
        }
    )
    topo = apply_reshard_plan(shards, tip, plan)
    first_batch: dict[str, int] = {}
    last_batch: dict[str, int] = {}
    seen: list[tuple] = []
    cur = r.initialOffset()
    for batch in range(200):
        rows, nxt = r.read(cur)
        rows = list(rows)
        for t in rows:
            first_batch.setdefault(t[0], batch)
            last_batch[t[0]] = batch
        seen.extend((t[0], t[1]) for t in rows)
        if nxt == cur:
            break
        cur = nxt
    else:
        raise AssertionError(f"stream never drained: plan={plan}")
    # completeness: the drained multiset is exactly the topology
    want = sorted(
        (t.shard_id, q) for t in topo for q in range(t.n_records)
    )
    assert sorted(seen) == want, f"plan={plan}"
    # the ordering contract, on OUTPUT: child's first batch strictly after
    # every parent's last batch
    by_index = {t.index: t for t in topo}
    for t in topo:
        for p in (t.parent, t.adjacent_parent):
            if p is None:
                continue
            child_first = first_batch[t.shard_id]
            parent_last = last_batch[by_index[p].shard_id]
            assert child_first > parent_last, (
                f"plan={plan}: {t.shard_id} first batch {child_first} !> "
                f"parent {by_index[p].shard_id} last batch {parent_last}"
            )


@settings(max_examples=80, deadline=None)
@given(data=st.data())
def test_merge_ledger_snapshots_is_a_lawful_union(data):
    """``merge_ledger_snapshots`` on snapshots drawn from one ground
    truth (any two observers of the same stream agree wherever they
    overlap) must behave as a set union: commutative, associative,
    idempotent, sorted-ordinal output, and covering every input entry.
    With a single disagreeing (shard, ordinal) injected — the retention-
    drift signal — it must raise instead of picking a winner."""
    from amazon_kinesis_data_analytics_flinktableapi_spark.sources.kinesis_client import (
        merge_ledger_snapshots,
    )

    # ground truth: up to 3 shards, each with a consistent ordinal→seq map
    truth = {
        f"shardId-{s:012d}": {
            o: f"seq-{s}-{o * 7 + 3}"
            for o in data.draw(
                st.sets(st.integers(0, 40), max_size=12), label=f"ords{s}"
            )
        }
        for s in range(data.draw(st.integers(1, 3), label="shards"))
    }

    def snap(label):
        out = {}
        for sid, m in truth.items():
            picked = data.draw(
                st.sets(st.sampled_from(sorted(m)), max_size=len(m))
                if m else st.just(set()),
                label=f"{label}:{sid}",
            )
            if picked:
                ords = sorted(picked)
                out[sid] = {
                    "ordinals": ords, "sequences": [m[o] for o in ords]
                }
        return out

    a, b, c = snap("a"), snap("b"), snap("c")
    ab = merge_ledger_snapshots(a, b)
    # commutative + associative + idempotent
    assert ab == merge_ledger_snapshots(b, a)
    assert merge_ledger_snapshots(ab, c) == merge_ledger_snapshots(
        a, merge_ledger_snapshots(b, c)
    )
    assert merge_ledger_snapshots(ab, ab) == ab
    # union BOTH directions: every input entry present in the output, and
    # every output entry present in an input (no fabricated entries)
    as_set = lambda snap: {  # noqa: E731
        (sid, o, q)
        for sid, e in snap.items()
        for o, q in zip(e["ordinals"], e["sequences"])
    }
    assert as_set(ab) == as_set(a) | as_set(b)
    for sid, entry in ab.items():
        assert entry["ordinals"] == sorted(entry["ordinals"])
    # drift: flip one sequence on a side that carries at least one entry
    sided = [(s, sid) for s in (a, b) for sid, e in s.items() if e["ordinals"]]
    if sided and ab:
        side, sid = data.draw(st.sampled_from(sided), label="drift site")
        import copy

        bad = copy.deepcopy(side)
        bad[sid]["sequences"][0] = "seq-DRIFTED"
        other = b if side is a else a
        # only raises if the drifted ordinal is actually contested
        o0 = bad[sid]["ordinals"][0]
        contested = sid in other and o0 in other[sid]["ordinals"]
        if contested:
            import pytest

            with pytest.raises(ValueError, match="ledger drift"):
                merge_ledger_snapshots(bad, other)

"""Time-interval join — the reference's centerpiece operator (Q4).

Reference semantics (StreamingJob.java:96-100, SURVEY.md §2 Q4): for each
left row ``o``, match every right row ``r`` with

    o.<key> = r.<key>                      (equi conjunct)
    AND o.<time> >= r.<time>               (inclusive upper bound)
    AND r.<time> >  o.<time> - <interval>  (exclusive lower bound)

i.e. right rows valid in the half-open window ``(o.t - interval, o.t]``.
Multiple matches fan out to multiple output rows (it is NOT an as-of join);
left-outer emits unmatched left rows once with NULLs (README.md:246).

Spark-first design: declare the join condition as expressions and let
Catalyst plan it.

- Batch: the equi conjunct makes this a plain equi-join with range residual
  → shuffled hash / sort-merge on the key, range predicates evaluated as
  join residual.  AQE handles skewed keys.
- Streaming: with watermarks on both sides, Spark extracts the event-time
  range from the condition and derives join-state TTL from the interval
  bound automatically (no custom state management needed) — the same
  bounded-state translation Flink's planner performed for the reference.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: fixed-width interval units → microseconds (calendar units deliberately
#: absent: a month/year has no fixed width, so those go to the Catalyst probe)
_TIME_UNIT_US = {
    "week": 7 * 86_400 * 10**6,
    "day": 86_400 * 10**6,
    "hour": 3_600 * 10**6,
    "minute": 60 * 10**6,
    "second": 10**6,
    "millisecond": 1_000,
    "microsecond": 1,
}

_UNIT_TERM = re.compile(r"(-?\d+)\s+(week|day|hour|minute|second|millisecond|microsecond)s?\b")

#: interval strings already proven positive this process — plan builders
#: that construct many joins with the same window pay validation once
_VALIDATED_POSITIVE: set[str] = set()


def _try_parse_time_interval_us(interval: str) -> int | None:
    """Local (no Spark job) resolution of a fixed-width interval body like
    ``"5 seconds"`` or ``"1 hour 30 minutes"`` to microseconds.  Returns
    None for anything not fully covered by integer time-unit terms —
    calendar units ("1 month"), fractional values, quoted/ISO forms —
    which callers validate through Catalyst instead (the authority on
    INTERVAL syntax; this parser only fast-paths the unambiguous subset)."""
    s = interval.strip().lower()
    total, end, found = 0, 0, False
    for m in _UNIT_TERM.finditer(s):
        if s[end : m.start()].strip():
            return None  # unrecognized text between terms
        total += int(m.group(1)) * _TIME_UNIT_US[m.group(2)]
        end, found = m.end(), True
    if not found or s[end:].strip():
        return None
    return total


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str,
    interval: str = "5 seconds",
    how: str = "left_outer",
    extra_condition: Column | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Join ``left`` to every ``right`` row in ``(t - interval, t]``
    (``direction="backward"``, the reference's shape) or ``[t, t + interval)``
    (``direction="forward"`` — the look-ahead mirror).

    ``interval`` is a SQL interval body, e.g. ``"5 seconds"``, ``"1 hour"``.
    Column references in the result are disambiguated via DataFrame aliases
    ``l`` and ``r`` — select with ``F.col("l.x")`` / ``F.col("r.y")``.
    """
    _require_positive_interval(left.sparkSession, interval)
    keys = [on] if isinstance(on, str) else list(on)
    l, r = left.alias("l"), right.alias("r")
    cond = None
    for k in keys:
        c = F.col(f"l.{k}") == F.col(f"r.{k}")
        cond = c if cond is None else (cond & c)
    lt, rt = F.col(f"l.{left_time}"), F.col(f"r.{right_time}")
    cond = cond & _range_cond(lt, rt, interval, direction)
    if extra_condition is not None:
        cond = cond & extra_condition
    return l.join(r, cond, how)


def _require_positive_interval(spark, interval: str) -> None:
    """Fail loudly at plan-build time on a non-positive interval: the
    window predicate is then unsatisfiable, and a left-outer join silently
    emits every left row with NULLs — plausible output, zero signal.

    Fixed-width forms ("5 seconds", "1 hour 30 minutes") are parsed
    LOCALLY — no Spark job, no live session needed — so callers building
    many joins pay nothing per call.  Only calendar/exotic forms
    ("1 month", fractional, quoted) fall back to a one-row Catalyst probe,
    and positive results are cached per process so even those validate
    once."""
    if interval in _VALIDATED_POSITIVE:
        return
    us = _try_parse_time_interval_us(interval)
    if us is None:
        t0 = F.lit("1970-01-01 00:00:00").cast("timestamp")
        row = (
            spark.range(1)
            .select((t0 + F.expr(f"INTERVAL {interval}") > t0).alias("pos"))
            .collect()[0]
        )
        positive = bool(row.pos)
    else:
        positive = us > 0
    if not positive:
        raise ValueError(
            f"interval must be strictly positive, got {interval!r} — "
            "a non-positive window matches nothing"
        )
    _VALIDATED_POSITIVE.add(interval)


def _range_cond(lt: Column, rt: Column, interval: str, direction: str) -> Column:
    iv = F.expr(f"INTERVAL {interval}")
    if direction == "backward":
        return (lt >= rt) & (rt > lt - iv)
    if direction == "forward":
        return (rt >= lt) & (rt < lt + iv)
    if direction == "nearest":
        # the exact union of backward (t−W, t] and forward [t, t+W):
        # the symmetric open window (t−W, t+W) — t itself matches once
        return (rt > lt - iv) & (rt < lt + iv)
    raise ValueError(
        f"direction must be 'backward', 'forward' or 'nearest', got {direction!r}"
    )


def _interval_micros(spark, interval: str) -> int:
    """Resolve a SQL interval body to microseconds via Catalyst itself.
    Only fixed-width intervals can define bucket boundaries."""
    low = interval.lower()
    if "month" in low or "year" in low:
        raise ValueError(
            f"interval_join_bucketed requires a fixed-width interval, got {interval!r}; "
            "use interval_join for calendar intervals"
        )
    local = _try_parse_time_interval_us(interval)
    if local is not None:
        us = local  # fast path: no Spark job for the common integer forms
    else:
        row = spark.range(1).select(
            (F.unix_micros(F.lit("1970-01-01 00:00:00").cast("timestamp") + F.expr(f"INTERVAL {interval}"))).alias("us")
        ).collect()[0]
        us = int(row.us)
    if us <= 0:
        # a non-positive window matches NOTHING: backward needs rt > lt - iv
        # AND rt <= lt, which is unsatisfiable for iv <= 0 — a left-outer
        # join then silently emits every left row with NULLs (plausible
        # output, zero signal that the interval was the bug).  The bucketed
        # plan would additionally divide by the width.
        raise ValueError(
            f"interval must be strictly positive, got {interval!r} ({us} us) — "
            "a non-positive window matches nothing"
        )
    return us


def interval_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str,
    interval: str = "5 seconds",
    how: str = "left_outer",
    direction: str = "backward",
) -> DataFrame:
    """Scale-optimized interval join: identical semantics to
    ``interval_join``, executed as an *equi*-join on (key, time-bucket).

    Why: the naive plan shuffles on the equi key alone — with a
    low-cardinality key (5 currencies) that is ≤5 working partitions, and
    every probe scans the key's entire right side.  Bucketizing event time
    into interval-width buckets makes the join key (keys…, bucket):

    - a right row at time s can only match left rows in buckets b(s) or
      b(s)+1 (since s ∈ (t−W, t] ⇒ b(t) ∈ {b(s), b(s)+1}), so the right
      side is exploded exactly 2×;
    - the two copies carry different buckets, so no left row can match the
      same right row twice — no post-join dedup needed;
    - the range predicates remain as the join residual, preserving the
      half-open (t−W, t] semantics bit-for-bit.

    Effect: shuffle-key cardinality |keys| × |time range / W| (parallelism
    restored, AQE can split residual skew), and each probe list shrinks to
    ~2 buckets of right rows.  This is the plan that survives 100 TB; the
    naive form is kept for Catalyst-chosen broadcast cases.
    """
    normalized_how = how.lower().replace("_", "")
    if normalized_how in ("rightouter", "right", "fullouter", "full", "outer"):
        # the 2x (3x for nearest) right-side explode makes right-preserving
        # joins WRONG here: an unmatched right row has one copy per bucket,
        # all unmatched, so it would emit that many times.  Use the naive
        # interval_join for those.
        raise ValueError(
            f"interval_join_bucketed does not support how={how!r}: the right "
            "side is bucket-exploded per adjacent bucket, so right-preserving "
            "joins would emit unmatched right rows multiple times — use "
            "interval_join for right/full outer"
        )
    spark = left.sparkSession
    w_us = _interval_micros(spark, interval)
    keys = [on] if isinstance(on, str) else list(on)

    # the internal bucket columns would silently overwrite (withColumn)
    # and then drop same-named caller columns — refuse instead
    for side, df, reserved in (("left", left, "__bucket"), ("right", right, "__bucket"), ("right", right, "__b0")):
        if reserved in df.columns:
            raise ValueError(
                f"interval_join_bucketed reserves column name {reserved!r} "
                f"internally, but the {side} input already has it — rename "
                "the column before joining (it would be clobbered and dropped)"
            )

    l = left.withColumn("__bucket", F.floor(F.unix_micros(F.col(left_time)) / F.lit(w_us))).alias("l")
    r_b = right.withColumn("__b0", F.floor(F.unix_micros(F.col(right_time)) / F.lit(w_us)))
    # backward: s ∈ (t−W, t] ⇒ b(t) ∈ {b(s), b(s)+1}; forward: s ∈ [t, t+W)
    # ⇒ b(t) ∈ {b(s)−1, b(s)} — either way the right side explodes exactly
    # 2×.  nearest (r16): s ∈ (t−W, t+W) ⇒ b(t) ∈ {b(s)−1, b(s), b(s)+1} —
    # 3× explode, ONE join/shuffle, vs the old union of the two one-sided
    # joins (2 joins, 4 bucket-rows per right row, the left side scanned
    # and shuffled twice — ADVICE r15's named cost, now retired).
    # Distinct buckets per copy ⇒ each (l, r) pair still matches at most
    # once; no post-join dedup in ANY direction.
    all_shifts = {"backward": [0, 1], "forward": [0, -1], "nearest": [0, 1, -1]}
    if direction not in all_shifts:
        raise ValueError(
            f"direction must be 'backward', 'forward' or 'nearest', got {direction!r}"
        )
    shifts = all_shifts[direction]
    r = (
        r_b.withColumn(
            "__bucket", F.explode(F.array(*[F.col("__b0") + s for s in shifts]))
        )
        .drop("__b0")
        .alias("r")
    )

    cond = F.col("l.__bucket") == F.col("r.__bucket")
    for k in keys:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))
    lt, rt = F.col(f"l.{left_time}"), F.col(f"r.{right_time}")
    cond = cond & _range_cond(lt, rt, interval, direction)
    return l.join(r, cond, how).drop(F.col("l.__bucket")).drop(F.col("r.__bucket"))

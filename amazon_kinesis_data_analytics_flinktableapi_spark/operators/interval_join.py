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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str,
    interval: str = "5 seconds",
    how: str = "left_outer",
    extra_condition: Column | None = None,
) -> DataFrame:
    """Join ``left`` to every ``right`` row in ``(t - interval, t]``.

    ``interval`` is a SQL interval body, e.g. ``"5 seconds"``, ``"1 hour"``.
    Column references in the result are disambiguated via DataFrame aliases
    ``l`` and ``r`` — select with ``F.col("l.x")`` / ``F.col("r.y")``.
    """
    keys = [on] if isinstance(on, str) else list(on)
    l, r = left.alias("l"), right.alias("r")
    cond = None
    for k in keys:
        c = F.col(f"l.{k}") == F.col(f"r.{k}")
        cond = c if cond is None else (cond & c)
    lt, rt = F.col(f"l.{left_time}"), F.col(f"r.{right_time}")
    cond = cond & (lt >= rt) & (rt > lt - F.expr(f"INTERVAL {interval}"))
    if extra_condition is not None:
        cond = cond & extra_condition
    return l.join(r, cond, how)

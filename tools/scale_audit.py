"""Generate PLANS.md: a physical-plan audit of every headline query.

For each headline query (plus the reference flagship), capture the
formatted plan at sf0.001 and summarize the scale-relevant facts — number
of exchanges (shuffles), broadcast joins, sort-merge joins, scan
pushdown — into a reviewable markdown table with the raw plans below.
Run after plan-affecting changes; diff the committed PLANS.md to see
exactly what moved.

Counts are ABSOLUTE (VERDICT r8 #6): formatted plans re-print a cached
subtree under every InMemoryRelation reference and show pre-AQE
``== Initial Plan ==`` sections alongside the final plan, so a naive
grep triple-counts shuffles (neardup_jaccard read 36 where the real
shape is ~6).  ``count_plan_ops`` dedups by the plan's per-node ids and
skips initial-plan sections, so a number here is the count of DISTINCT
physical operators that actually execute — stable under caching and
plan re-prints, and therefore a meaningful cross-round diff.

Usage: python tools/scale_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

# the script lives in tools/; the package lives at the repo root one level up
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_TREE_NODE = re.compile(r"(\w+).*?\((\d+)\)")
#: details-block match: "(N) Exchange" then its detail lines (non-blank,
#: never a new "(M) Op" header) up to "Arguments: SinglePartition" — real
#: formatted output puts "Input [n]: [...]" between header and Arguments
_SINGLE_PARTITION = re.compile(
    r"\((\d+)\) Exchange\n(?:[^\n(][^\n]*\n){0,8}?Arguments: SinglePartition"
)


def count_plan_ops(plan: str) -> dict[str, int]:
    """Absolute operator counts from a formatted plan string.

    - dedups by node id: a cached subtree printed under three
      InMemoryTableScan references contributes each Exchange ONCE;
    - skips ``== Initial Plan ==`` sections (indentation-scoped, so
      nested AQE dumps inside InMemoryRelations are handled): only nodes
      that survive into the final/physical plan count;
    - ``ReusedExchange`` / ``BroadcastExchange`` are distinct operator
      names and never inflate the shuffle count.
    """
    ids: dict[str, set[str]] = {
        "Exchange": set(),
        "BroadcastHashJoin": set(),
        "SortMergeJoin": set(),
    }
    # Section scoping uses the FIRST NON-SPACE COLUMN, not total prefix
    # length: the AQE dump linearizes nested cached-plan sections between
    # outer-tree lines, and an outer-tree line resuming after a nested
    # dump can be "deeper" in raw spaces while its ":"/"+-" tree-drawing
    # characters sit at a SHALLOWER column than the marker — that column
    # is the true structural depth.  A marker's own content starts deeper
    # than the marker's column; any line whose structure starts strictly
    # left of it ends the section.
    skip_stack: list[int] = []  # columns of active == Initial Plan == markers
    for line in plan.splitlines():
        stripped = line.lstrip(" ")
        col = len(line) - len(stripped)
        while skip_stack and col < skip_stack[-1]:
            skip_stack.pop()
        body = stripped.lstrip(":+-* ")  # drop tree-drawing characters
        if body.startswith("== Initial Plan =="):
            skip_stack.append(col)
            continue
        if skip_stack:
            continue
        node = _TREE_NODE.match(body)
        if node and node.group(1) in ids:
            ids[node.group(1)].add(node.group(2))
    # SinglePartition lives in the details block — intersect with the ids
    # that actually execute
    single = {i for i in _SINGLE_PARTITION.findall(plan) if i in ids["Exchange"]}
    return {
        "exchange": len(ids["Exchange"]),
        "single": len(single),
        "bhj": len(ids["BroadcastHashJoin"]),
        "smj": len(ids["SortMergeJoin"]),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from amazon_kinesis_data_analytics_flinktableapi_spark.engine import build_spark
    from amazon_kinesis_data_analytics_flinktableapi_spark.plans import explain_str
    from amazon_kinesis_data_analytics_flinktableapi_spark.queries import all_specs

    spark = build_spark(app_name="scale_audit", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")

    rows, plans = [], []
    for name, spec in all_specs().items():
        if not spec.headline:
            continue
        df = spec.fn(spark, sf_dir)
        plan = explain_str(df, "formatted")
        c = count_plan_ops(plan)
        pushed = "yes" if re.search(r"PushedFilters: \[[^\]]", plan) else "—"
        rows.append(
            f"| {name} | {c['exchange']} | {c['single']} | {c['bhj']} | {c['smj']} | {pushed} |"
        )
        plans.append(f"## {name}\n\n```\n{plan.strip()}\n```\n")

    try:
        head = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            check=True, capture_output=True, text=True,
        ).stdout.strip()
    except Exception:
        head = "unknown"

    header = f"""# PLANS — physical-plan audit of the headline queries

<!-- generated-at-commit: {head} -->

Generated by `tools/scale_audit.py` (sf0.001 plans; plan SHAPE is
SF-independent for these queries, modulo AQE's runtime join demotions at
tiny sizes).  Columns: DISTINCT Exchange operators (shuffles) in the
final plan, of which SinglePartition (only acceptable for measured-small
or final top-k/global aggregates), broadcast vs sort-merge joins, and
whether any scan has pushed filters.  Counts dedup by plan node id and
exclude pre-AQE `== Initial Plan ==` sections, so cached-subtree
re-prints don't inflate them — the numbers are absolute operator counts
and cross-round diffs are signal.  Regenerate and diff after
plan-affecting changes:

    python tools/scale_audit.py

| query | exch | single | bcast | smj | pushdown |
|---|---|---|---|---|---|
"""
    body = header + "\n".join(rows) + "\n\n" + "\n".join(plans)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLANS.md"), "w") as f:
        f.write(body)
    print(f"PLANS.md written: {len(rows)} headline queries audited")
    spark.stop()


if __name__ == "__main__":
    main()

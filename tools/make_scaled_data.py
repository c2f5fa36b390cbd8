"""Derive an sfN dataset from the largest driver-generated SF.

The driver ships sf0.001/sf0.01/sf0.1 only (TESTDATA.md; the testdata
tree is read-only), but SCALING.md needs at least one data point in the
regime where DATA cost, not job fixed cost, dominates the runtime —
VERDICT r10 #5.  This tool synthesises sf1 from sf0.1 by *structure-
preserving replication*: the workload SHAPE (join fan-outs, duplicate-
cluster sizes, bucket occupancies) matches what the driver's generator
would produce at the larger SF, so per-decade runtime ratios measured
on it are meaningful.

Replication rules, per table class:

* **Fixed dimensions** (``region``, ``nation``): copied verbatim —
  TPC-H semantics, these do not grow with SF.  Foreign keys into them
  (``c_nationkey``, ``s_nationkey``) are therefore NOT shifted.
* **Fact / scaled-dim tables** (``customer supplier part orders
  lineitem events``): ``copies`` copies, with every surrogate key
  (``o_orderkey l_orderkey o_custkey c_custkey l_suppkey s_suppkey
  l_partkey p_partkey event_id user_id``) shifted by ``i * stride``
  where ``stride`` is a power of ten above the source's max key.  Key
  shifting keeps every join edge intact within a copy and creates zero
  edges across copies — exactly how the real generator grows a star
  schema (per-key fan-outs constant, key cardinality ×copies).
* **documents**: ``doc_id`` shifted; for copy i>0 every whitespace
  token in ``text`` gets an ``·i`` suffix.  The rename is injective
  per copy, so *within-copy* shingle/Jaccard/SimHash relationships are
  exactly preserved while *cross-copy* token sets are disjoint —
  duplicate-cluster COUNT scales ×copies with cluster SIZES unchanged,
  matching a generator that draws fresh clusters per SF.  (Naively
  copying text verbatim would instead multiply every cluster's size by
  ``copies`` and blow candidate-pair work up quadratically — a
  workload the real sf1 would not contain.)  ``n_chars`` is recomputed.
* **embeddings**: ``vec_id`` shifted; copy i's vectors are cyclically
  rotated by ``i`` dimensions.  A common permutation of dimensions
  preserves every within-copy cosine similarity exactly and
  decorrelates cross-copy pairs, so ANN/near-dup bucket occupancy
  grows linearly, not quadratically.  The driver's own decade grows
  embeddings ×4 (500 → 2000 between sf0.01 and sf0.1), so this table
  uses ``max(2, copies * 4 // 10)`` copies to follow that ratio.

* ``--extend-time-axis`` (VERDICT r15 #4): by default the copies keep
  their ORIGINAL timestamps, so a 10× scale-up packs 10× the rows into
  a FIXED time range — per-(key, time-bucket) density ×10, which makes
  every interval/as-of join's candidate count grow ~quadratically in
  the decade.  That regime exists (hot keys in a traffic spike) but is
  NOT how production data usually grows: more history = a LONGER time
  axis at roughly constant per-bucket density.  With the flag, copy i's
  every datetime column (``ts``, ``o_orderdate``, ``l_shipdate``) also
  shifts by ``i × span`` where ``span`` is the (max − min) of its ERA
  GROUP (datetime columns with overlapping ranges share one stride; see
  ``_time_strides``), rounded up to whole days + 1 day — a shared
  offset per era, so every within-copy time relationship (order→ship
  intervals, rate windows) is preserved exactly while copies occupy
  disjoint time ranges.  Density per bucket is then constant and the
  family's decade ratio measures the production shape.

Usage::

    python tools/make_scaled_data.py --src /root/testdata/sf0.1 \
        --dst /tmp/scaled/sf1 --copies 10 [--extend-time-axis]
"""

from __future__ import annotations

import argparse
import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

FIXED_DIMS = ["region", "nation"]
FACTS = ["customer", "supplier", "part", "orders", "lineitem", "events"]
# key columns that live in a scaled key domain (NOT nationkey/regionkey)
SHIFT_COLS = {
    "o_orderkey", "l_orderkey", "o_custkey", "c_custkey",
    "l_suppkey", "s_suppkey", "l_partkey", "p_partkey",
    "event_id", "user_id",
    # documents/embeddings ids are shifted in their own per-copy blocks,
    # but their maxima MUST participate in the stride computation — a
    # stride chosen from the fact tables alone silently collides if the
    # id domains ever exceed it (ADVICE r11)
    "doc_id", "vec_id",
}

_TOKEN = re.compile(r"(\S+)")


def _stride(frames: list[pd.DataFrame]) -> int:
    """One global power-of-ten stride above every shiftable key."""
    mx = 0
    for df in frames:
        for c in df.columns:
            if c in SHIFT_COLS and len(df):
                mx = max(mx, int(df[c].max()))
    s = 10
    while s <= mx:
        s *= 10
    # several registry queries synthesise derived ids by adding a fixed
    # offset (queries/llm.py COPY_OFFSET = 1_000_000); a stride equal to
    # that offset makes copy-i originals collide with copy-(i-1) synthetic
    # ids, violating the operators' unique-id precondition (two texts per
    # doc_id → duplicate postings → zero Jaccard union).  Keep the stride
    # a decade above any such offset.
    return max(s, 10_000_000)


def _write(dst: str, name: str, df: pd.DataFrame, schema: pa.Schema) -> None:
    table = pa.Table.from_pandas(df, schema=schema, preserve_index=False)
    pq.write_table(table, os.path.join(dst, f"{name}.parquet"))
    print(f"  {name}: {len(df):,} rows")


def _time_strides(fact_dfs: dict[str, pd.DataFrame]) -> dict[tuple[str, str], pd.Timedelta]:
    """Per-(table, column) whole-day time stride for --extend-time-axis.

    Columns are grouped into ERAS by overlapping [min, max] ranges
    (orders.o_orderdate 1995-2001 and lineitem.l_shipdate 1995-2001
    overlap → one group sharing ONE stride, so cross-table date
    comparisons inside a copy survive the shift; events.ts lives alone
    in 2024 → its own 1-month stride).  A single GLOBAL stride would
    have to cover the 1995→2024 gap between eras, which (a) overflows
    pandas' ns arithmetic by copy ~8 (year 2262 ceiling) and (b) models
    nothing: no query time-joins across eras — the driver's generator
    itself placed them decades apart."""
    ranges = []  # (min, max, table, col)
    for t, df in fact_dfs.items():
        for c in df.columns:
            if pd.api.types.is_datetime64_any_dtype(df[c]) and len(df):
                ranges.append((df[c].min(), df[c].max(), t, c))
    ranges.sort(key=lambda r: r[0])
    out: dict[tuple[str, str], pd.Timedelta] = {}
    group: list[tuple] = []

    def flush(g):
        if not g:
            return
        span = pd.Timedelta(days=(max(r[1] for r in g) - min(r[0] for r in g)).days + 2)
        for r in g:
            out[(r[2], r[3])] = span

    for r in ranges:
        if group and r[0] <= max(x[1] for x in group):
            group.append(r)
        else:
            flush(group)
            group = [r]
    flush(group)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/scaled/sf1")
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--extend-time-axis", action="store_true")
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)

    read = lambda t: pq.read_table(os.path.join(args.src, f"{t}.parquet"))

    for t in FIXED_DIMS:
        tab = read(t)
        pq.write_table(tab, os.path.join(args.dst, f"{t}.parquet"))
        print(f"  {t}: {tab.num_rows:,} rows (verbatim)")

    fact_tabs = {t: read(t) for t in FACTS}
    fact_dfs = {t: tab.to_pandas() for t, tab in fact_tabs.items()}
    dtab = read("documents")
    docs = dtab.to_pandas()
    etab = read("embeddings")
    emb = etab.to_pandas()
    # stride over ALL shiftable id domains, incl. doc_id/vec_id
    stride = _stride([*fact_dfs.values(), docs[["doc_id"]], emb[["vec_id"]]])
    print(f"key stride: {stride:,}")

    tstrides = _time_strides(fact_dfs) if args.extend_time_axis else {}
    if tstrides:
        print(f"time-axis strides: { {k: str(v) for k, v in tstrides.items()} }")

    for t, df in fact_dfs.items():
        parts = []
        for i in range(args.copies):
            c = df.copy()
            for col in c.columns:
                if col in SHIFT_COLS:
                    c[col] = c[col] + i * stride
                elif (t, col) in tstrides:
                    c[col] = c[col] + i * tstrides[(t, col)]
            parts.append(c)
        _write(args.dst, t, pd.concat(parts, ignore_index=True),
               fact_tabs[t].schema)

    # documents: injective per-copy token rename (see module docstring)
    parts = []
    for i in range(args.copies):
        c = docs.copy()
        c["doc_id"] = c["doc_id"] + i * stride
        if i > 0:
            suffix = f"·{i}"
            # .str.replace leaves NaN (NULL text) untouched — correct:
            # a NULL document stays NULL in every copy
            c["text"] = c["text"].str.replace(_TOKEN, r"\1" + suffix, regex=True)
        # nullable length: plain .astype("int64") raises on NULL text
        # rows (ADVICE r11); Int64 keeps NULL text → NULL n_chars
        c["n_chars"] = c["text"].str.len().astype("Int64")
        parts.append(c)
    _write(args.dst, "documents", pd.concat(parts, ignore_index=True),
           dtab.schema)

    # embeddings: per-copy cyclic dimension rotation (cosine-preserving)
    e_copies = max(2, args.copies * 4 // 10)
    mat = np.stack(emb["embedding"].to_numpy())
    parts = []
    for i in range(e_copies):
        c = emb.copy()
        c["vec_id"] = c["vec_id"] + i * stride
        rolled = np.roll(mat, i, axis=1)
        c["embedding"] = [row for row in rolled]
        parts.append(c)
    _write(args.dst, "embeddings", pd.concat(parts, ignore_index=True),
           etab.schema)
    print(f"done -> {args.dst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

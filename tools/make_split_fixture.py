"""Rewrite a TESTDATA SF directory as MULTI-FILE parquet datasets.

Why (VERDICT r17 item 4 / r18 work item 3): the driver's sf fixtures are
single-row-group single-file tables, so every scan is ONE task and the
scan→broadcast-join→partial-agg chains of the TPC-H-style headliners run
serial regardless of core count — the r17 8-vs-32-core scaling block
read ratios ≈1 for six headliners and could not say whether the ENGINE
parallelizes.  This tool produces a row-identical copy of the SF with
each table split into ``--files`` part files (row-range slices, order
preserved within and across parts), the layout a real 100 TB corpus
arrives in.  Queries read it unchanged (``read_table`` accepts
directory-style ``name.parquet/`` datasets), so an 8-vs-32-core probe on
the split fixture isolates the fixture-layout variable.

NOT for the driver bench or the oracle gate: the driver's own testdata
stays untouched; this fixture exists for SCALING.md probes only.

Usage::

    python tools/make_split_fixture.py --src /root/testdata/sf0.1 \
        --dst /tmp/split_sf0.1 --files 32
"""

from __future__ import annotations

import argparse
import glob
import os

import pyarrow.parquet as pq

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
#: fixed dimensions stay single-file — they are tiny and always broadcast
SINGLE = {"region", "nation"}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/split_sf0.1")
    ap.add_argument("--files", type=int, default=32)
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)

    for t in TABLES:
        src = os.path.join(args.src, f"{t}.parquet")
        if not os.path.exists(src):
            print(f"  {t}: missing in src, skipped")
            continue
        tab = pq.read_table(src)
        if t in SINGLE or tab.num_rows < args.files:
            pq.write_table(tab, os.path.join(args.dst, f"{t}.parquet"))
            print(f"  {t}: {tab.num_rows:,} rows (single file)")
            continue
        out_dir = os.path.join(args.dst, f"{t}.parquet")
        os.makedirs(out_dir, exist_ok=True)
        for old in glob.glob(os.path.join(out_dir, "part-*.parquet")):
            os.remove(old)
        n = tab.num_rows
        per = -(-n // args.files)  # ceil
        for i in range(args.files):
            lo = i * per
            if lo >= n:
                break
            piece = tab.slice(lo, min(per, n - lo))
            pq.write_table(piece, os.path.join(out_dir, f"part-{i:05d}.parquet"))
        print(f"  {t}: {n:,} rows -> {min(args.files, -(-n // per))} files of ~{per:,}")
    print(f"done -> {args.dst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

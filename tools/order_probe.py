"""Session-position sensitivity probe (VERDICT r16 #1).

``duplicate_span_removal`` read 0.276 s (r13) -> 0.477 s (r16) across
four driver windows on byte-identical code and unchanged plan counts.
The missed variable: its POSITION in the headline loop moved every
round with the registry reorder — r13/r14 ran it 8th of 15 (a warm
session: seven queries' worth of JIT, parquet footer caches, codegen
and AQE state already paid), r15 ran it 13th inside a globally slow
window, r16 ran it FIRST (its sample trace starts 1.958 s, session
stone-cold).  bench.py's min-of-5 protects against host windows, not
against a systematically cold session prefix.

This probe measures that position effect directly, in ONE session so
host-window drift cancels:

1. warm the JVM exactly like bench.py (spark.range sum);
2. COLD arm — run the probe queries as the session's first real work
   (r16's position), 5 samples each;
3. run the seven queries that preceded position 8 in the r13 headline
   order, one pass (the session state r13's measurement enjoyed);
4. WARM arm — run the probe queries again, 5 samples each;
5. bracket both arms with the parallel canary so a host window
   spanning one arm is visible in-band.

cold_min / warm_min >> 1 with flat canaries = the creep is session
position, not code.  Usage::

    python tools/order_probe.py [sf_dir] [--cpus 32] [--samples 5] \
        [--queries duplicate_span_removal,incremental_dedup]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: headline queries that ran BEFORE position 8 in the r13 order
#: (BENCH_SELF_r13.json "queries" key order)
R13_PREFIX = [
    "embedding_neardup",
    "interval_join",
    "currency_conversion",
    "neardup_jaccard",
    "dedup_clusters",
    "dedup_exact",
    "ann_cosine_topk",
]


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", default="32")
    ap.add_argument("--samples", type=int, default=5)
    ap.add_argument(
        "--queries", default="duplicate_span_removal,incremental_dedup"
    )
    ap.add_argument(
        "--prefix-passes", type=int, default=1,
        help="passes over the r13 prefix before the warm arm; bench.py "
        "takes 3-5 samples per query, so 3 approximates the ~25 query "
        "executions r13's position-8 measurement sat behind",
    )
    args = ap.parse_args()
    probes = [q for q in args.queries.split(",") if q]

    from amazon_kinesis_data_analytics_flinktableapi_spark.engine import build_spark
    from amazon_kinesis_data_analytics_flinktableapi_spark.queries import REGISTRY

    unknown = [q for q in probes + R13_PREFIX if q not in REGISTRY]
    if unknown:
        raise SystemExit(f"not in registry: {unknown}")

    spark = build_spark(app_name="order_probe", master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # bench.py's JVM warm

    def canary() -> float:
        t = time.perf_counter()
        spark.range(64_000_000).selectExpr("sum(id * 3 + 1)").collect()
        return round(time.perf_counter() - t, 3)

    def run(q: str, n: int) -> list[float]:
        out = []
        for _ in range(n):
            spark.catalog.clearCache()
            t = time.perf_counter()
            REGISTRY[q].fn(spark, args.sf_dir).count()
            out.append(round(time.perf_counter() - t, 3))
        return out

    c0 = canary()
    cold = {q: run(q, args.samples) for q in probes}
    c1 = canary()
    t = time.perf_counter()
    for _ in range(args.prefix_passes):
        for q in R13_PREFIX:
            spark.catalog.clearCache()
            REGISTRY[q].fn(spark, args.sf_dir).count()
    prefix_sec = round(time.perf_counter() - t, 3)
    c2 = canary()
    warm = {q: run(q, args.samples) for q in probes}
    c3 = canary()
    spark.stop()

    print(f"\nsf_dir={args.sf_dir} cpus={args.cpus} samples={args.samples}")
    print(f"canaries: pre-cold={c0} post-cold={c1} post-prefix={c2} post-warm={c3}")
    print(f"r13 prefix (7 queries, 1 pass): {prefix_sec} s")
    print("| query | cold min | warm min | cold/warm | cold samples | warm samples |")
    print("|---|---|---|---|---|---|")
    for q in probes:
        cm, wm = min(cold[q]), min(warm[q])
        print(f"| {q} | {cm:.3f} s | {wm:.3f} s | {cm / wm:.2f}x | {cold[q]} | {warm[q]} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

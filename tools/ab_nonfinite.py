"""Quiet-host A/B of the r14 non-finite hardening cost (VERDICT r14 #1).

The r14 driver bench showed the four hardened headliners
(``currency_conversion`` 1.96x, ``interval_join`` +33%,
``embedding_neardup`` +21%, ``neardup_jaccard`` +27%) regressing vs r13
in a window whose sched-canary read 1.44x contention; the builder's
quiet-host total was best-ever on identical code.  This tool settles the
attribution: it times each headliner with the hardening filters AS
SHIPPED and with them monkeypatched to ``lit(True)`` (Catalyst
constant-folds a TRUE filter away, so the OFF arm is the exact pre-r14
plan), interleaving the two arms sample-by-sample so a host slow window
taxes both equally.  min-of-N per arm; the delta is the filter's cost.

Patch points (why these three): ``queries/reference.py`` imports
``finite_or_null`` INSIDE the role builders (reads the module attribute
at call time), while ``queries/llm.py`` binds ``finite_embedding`` at
module top — so the scalar module AND llm's top-level binding must both
be patched.  (r16: the query modules now route the vector swallow
through ``scalar.swallow_malformed_embeddings``, which resolves
``finite_embedding`` in the scalar module's globals at call time — the
``scalar.finite_embedding`` patch therefore covers every site; the llm
binding patch is kept for the tool's own backward comparability and is
inert.)

``neardup_jaccard`` is the built-in CONTROL: its plan never references
either patched function and its corpus memo is shared by both arms, so
the two arms run byte-identical code — its measured delta IS the noise
floor of the min-of-N statistic, against which the other three deltas
must be read.

``--micro`` adds a scan-isolated microbenchmark: count() over the sf
events/embeddings tables with the real predicate vs ``lit(True)``,
min-of-9.  The headline queries bury a few-ms scan predicate under
join/shuffle variance; the micro numbers read the predicate's own cost
directly, and being scan-local it extrapolates linearly to any scale.

Usage::

    python tools/ab_nonfinite.py [sf_dir] [--cpus 32] [--samples 5] [--micro]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "currency_conversion",
    "interval_join",
    "embedding_neardup",
    "neardup_jaccard",
]


def main() -> int:
    sf_dir = (
        sys.argv[1]
        if len(sys.argv) > 1 and not sys.argv[1].startswith("-")
        else "/root/testdata/sf0.1"
    )
    cpus = sys.argv[sys.argv.index("--cpus") + 1] if "--cpus" in sys.argv else "32"
    n_samples = int(sys.argv[sys.argv.index("--samples") + 1]) if "--samples" in sys.argv else 5

    from pyspark.sql import functions as F

    from amazon_kinesis_data_analytics_flinktableapi_spark.engine import build_spark
    from amazon_kinesis_data_analytics_flinktableapi_spark.functions import scalar
    from amazon_kinesis_data_analytics_flinktableapi_spark.queries import REGISTRY, llm

    spark = build_spark(app_name="ab_nonfinite", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm JVM, untimed

    orig = {
        "scalar.finite_or_null": scalar.finite_or_null,
        "scalar.finite_embedding": scalar.finite_embedding,
        "llm.finite_embedding": llm.finite_embedding,
    }

    def set_filters(on: bool) -> None:
        if on:
            scalar.finite_or_null = orig["scalar.finite_or_null"]
            scalar.finite_embedding = orig["scalar.finite_embedding"]
            llm.finite_embedding = orig["llm.finite_embedding"]
        else:
            true_fn = lambda col: F.lit(True)  # noqa: E731 — folded away by Catalyst
            scalar.finite_or_null = true_fn
            scalar.finite_embedding = true_fn
            llm.finite_embedding = true_fn

    samples: dict[tuple[str, str], list[float]] = {
        (q, arm): [] for q in QUERIES for arm in ("on", "off")
    }
    try:
        # warmup pass per (query, arm): compiles the AQE-final classes for
        # BOTH plans before any timed sample (the two arms generate
        # different codegen classes; without this, arm order biases run 1)
        for q in QUERIES:
            for arm in ("on", "off"):
                set_filters(arm == "on")
                spark.catalog.clearCache()
                REGISTRY[q].fn(spark, sf_dir).count()
        for i in range(n_samples):
            # alternate which arm goes first each round so a slow window
            # spanning one (query, round) taxes on/off symmetrically
            arms = ("on", "off") if i % 2 == 0 else ("off", "on")
            for q in QUERIES:
                for arm in arms:
                    set_filters(arm == "on")
                    spark.catalog.clearCache()
                    t = time.perf_counter()
                    REGISTRY[q].fn(spark, sf_dir).count()
                    samples[(q, arm)].append(round(time.perf_counter() - t, 3))
    finally:
        set_filters(True)

    print(f"\nsf_dir={sf_dir} cpus={cpus} samples={n_samples} (min-of-N, interleaved arms)")
    print("| query | filter ON min | filter OFF min | delta | ON samples | OFF samples |")
    print("|---|---|---|---|---|---|")
    worst = 0.0
    for q in QUERIES:
        on = min(samples[(q, "on")])
        off = min(samples[(q, "off")])
        delta = (on - off) / off * 100 if off else float("nan")
        if q != "neardup_jaccard":
            worst = max(worst, delta)
        tag = " (CONTROL — arms identical)" if q == "neardup_jaccard" else ""
        print(
            f"| {q}{tag} | {on:.3f} s | {off:.3f} s | {delta:+.1f}% "
            f"| {samples[(q, 'on')]} | {samples[(q, 'off')]} |"
        )
    ctrl = samples[("neardup_jaccard", "on")], samples[("neardup_jaccard", "off")]
    noise = abs(min(ctrl[0]) - min(ctrl[1])) / min(ctrl[1]) * 100
    print(f"\nworst-case filter delta: {worst:+.1f}% vs control noise floor ±{noise:.1f}%")

    if "--micro" in sys.argv:
        from amazon_kinesis_data_analytics_flinktableapi_spark.sources.batch import read_parquet

        ev = read_parquet(spark, f"{sf_dir}/events.parquet")
        emb = read_parquet(spark, f"{sf_dir}/embeddings.parquet")
        # prepared path (VERDICT r15 #3): write the ingest-time validity
        # bit once, then read the flag column instead of re-running the
        # per-element lambda — the micro case quantifies the per-scan
        # saving the bit buys
        import tempfile

        from amazon_kinesis_data_analytics_flinktableapi_spark.functions.scalar import EMB_FINITE_COL
        from amazon_kinesis_data_analytics_flinktableapi_spark.operators.embedding_prep import (
            write_prepared_embeddings,
        )

        # the sf0.1 embeddings table is 2k rows — far too small to read a
        # per-vector cost through job fixed costs (±10ms scheduling noise
        # vs ~15ms of total lambda work).  Replicate it 128× (~256k
        # vectors) BEFORE writing both the raw and prepared parquet, so
        # the lambda-vs-flag comparison is data-dominated and both sides
        # pay identical scan bytes.
        emb_big = emb.crossJoin(spark.range(128).select(F.col("id").alias("__copy")))
        emb_big = emb_big.select(
            (F.col("vec_id") * 1000 + F.col("__copy")).alias("vec_id"), "embedding"
        )
        base = tempfile.mkdtemp(prefix="ab_emb_prep_")
        emb_big.write.mode("overwrite").parquet(base + "/raw")
        write_prepared_embeddings(spark.read.parquet(base + "/raw"), base + "/prepared")
        emb_raw = spark.read.parquet(base + "/raw")
        emb_prep = spark.read.parquet(base + "/prepared")
        cases = [
            ("events finite_or_null(value)", ev, orig["scalar.finite_or_null"]("value")),
            ("embeddings x128 finite_embedding", emb_raw, orig["scalar.finite_embedding"]("embedding")),
            ("prepared embeddings x128 flag col", emb_prep, F.col(EMB_FINITE_COL)),
        ]
        print("\nscan-isolated predicate cost (count() with pred vs lit(True), min-of-9):")
        print("| scan | pred min | true min | delta | rows |")
        print("|---|---|---|---|---|")
        for label, df, pred in cases:
            micro: dict[str, list[float]] = {"pred": [], "true": []}
            arms2 = [("pred", pred), ("true", F.lit(True))]
            for arm, p in arms2:  # warm both codegen classes
                df.filter(p).count()
            n_rows = 0
            for i in range(9):
                order = arms2 if i % 2 == 0 else arms2[::-1]
                for arm, p in order:
                    t = time.perf_counter()
                    n = df.filter(p).count()
                    micro[arm].append(round(time.perf_counter() - t, 4))
                    if arm == "true":
                        n_rows = n
            pm, tm = min(micro["pred"]), min(micro["true"])
            print(f"| {label} | {pm:.4f} s | {tm:.4f} s | {(pm - tm) / tm * 100:+.1f}% | {n_rows} |")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

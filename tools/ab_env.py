"""Interleaved code-arm A/B for env-gated engine knobs.

Same methodology as tools/ab_nonfinite.py / tools/ab_bench.py (one
session, per-arm warmup so each arm's AQE-final codegen classes exist,
caches dropped per sample, arms alternated sample-by-sample so a host
window taxes both equally, min-of-N), generalized to ANY knob the engine
reads from the environment at call time (e.g.
``SPARK_GRAFT_FANOUT_MIN_BYTES``).

Usage::

    python tools/ab_env.py [sf_dir] --var SPARK_GRAFT_FANOUT_MIN_BYTES \
        --arms 0,2097152,8388608 --queries a,b,c [--samples 5] [--cpus 32]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = argv[0] if argv and not argv[0].startswith("-") else "/root/testdata/sf0.1"

    def opt(name: str, default: str) -> str:
        if name not in argv:
            return default
        i = argv.index(name) + 1
        if i >= len(argv) or argv[i].startswith("--"):
            raise SystemExit(f"usage: {name} requires a value")
        return argv[i]

    var = opt("--var", "SPARK_GRAFT_FANOUT_MIN_BYTES")
    arms = opt("--arms", "0,2097152").split(",")
    queries = [q for q in opt("--queries", "").split(",") if q]
    n_samples = int(opt("--samples", "5"))
    cpus = opt("--cpus", "32")
    if not queries:
        raise SystemExit("--queries is required")

    from amazon_kinesis_data_analytics_flinktableapi_spark.engine import build_spark
    from amazon_kinesis_data_analytics_flinktableapi_spark.queries import REGISTRY

    unknown = [q for q in queries if q not in REGISTRY]
    if unknown:
        raise SystemExit(f"not in registry: {unknown}")

    spark = build_spark(app_name="ab_env", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm JVM, untimed

    def run(q: str) -> float:
        spark.catalog.clearCache()
        t = time.perf_counter()
        REGISTRY[q].fn(spark, sf_dir).count()
        return round(time.perf_counter() - t, 3)

    samples: dict[tuple[str, str], list[float]] = {}
    for q in queries:
        for arm in arms:  # per-(query, arm) warmup: arm plans differ
            os.environ[var] = arm
            run(q)
        for i in range(n_samples):
            # alternate arm order per sample so window edges cancel
            order = arms if i % 2 == 0 else arms[::-1]
            for arm in order:
                os.environ[var] = arm
                samples.setdefault((q, arm), []).append(run(q))
    spark.stop()

    print(f"\nsf_dir={sf_dir} cpus={cpus} var={var} samples={n_samples} (min-of-N, interleaved)")
    print("| query | " + " | ".join(f"{var}={a}" for a in arms) + " | best arm |")
    print("|---|" + "---|" * (len(arms) + 1))
    for q in queries:
        mins = {a: min(samples[(q, a)]) for a in arms}
        best = min(mins, key=lambda a: mins[a])
        cells = " | ".join(f"{mins[a]:.3f}" for a in arms)
        print(f"| {q} | {cells} | {best} |")
    print("\nraw:")
    for (q, a), v in samples.items():
        print(f"  {q} [{a}]: {v}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

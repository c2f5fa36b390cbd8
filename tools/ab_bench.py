"""Interleaved family attribution bench (VERDICT r15 #2).

The r15 driver bench regressed the UNCHANGED TPC-H/window family
(``agg_pricing_summary`` 2.34x raw, +78% after parallel-canary
normalization) in a window whose canaries read 1.29-1.51x; the code and
plans were untouched since r13.  ``tools/ab_nonfinite.py`` settled the
analogous r14 question by interleaving ON/OFF arms sample-by-sample with
a built-in control; this tool generalizes the methodology to the case
where there is no code arm to toggle: it times a QUERY FAMILY and a
CONTROL query round-robin in one session (so any host window taxes every
family member and the control equally), then compares each member's
quiet-window min against the values recorded in prior rounds' bench
artifacts (``BENCH_SELF_r{N}.json`` / ``BENCH_r{N}.json``).

Reading the output:

* control delta vs its own artifact history = the window-noise floor of
  this run;
* a family member whose min is within (or below) that floor of its
  r13/r14 artifact value carries NO code regression — the r15 artifact
  delta is attributed to the r15 window;
* a member that stays slow on a quiet host IS a real regression and
  needs a plan diff, not normalization.

Methodology details shared with ab_nonfinite: one untimed warmup per
query at the target SF first (AQE-final codegen classes are per-size),
caches dropped between samples, rotating start offset per round so
order effects cancel, min-of-N statistic.

Usage::

    python tools/ab_bench.py [sf_dir] [--cpus 32] [--samples 7] \
        [--queries a,b,c] [--control neardup_jaccard] [--vs 13,14,15]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: default family = the five queries the r15 verdict flagged `weak`
DEFAULT_FAMILY = [
    "agg_pricing_summary",
    "join_revenue_by_nation",
    "nation_pair_revenue",
    "shipping_priority",
    "tumbling_window_events",
]


def _artifact_queries(round_n: int, repo: str, sf: float) -> dict[str, float] | None:
    """Per-query timings from round N's bench artifact (sidecar first —
    truncation-proof — then the driver envelope's parsed dict)."""
    for name in (f"BENCH_SELF_r{round_n}.json", f"BENCH_r{round_n}.json"):
        p = os.path.join(repo, name)
        if not os.path.exists(p):
            continue
        try:
            with open(p) as f:
                d = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        for cand in (d, d.get("parsed") if isinstance(d, dict) else None):
            if (
                isinstance(cand, dict)
                and isinstance(cand.get("queries"), dict)
                and cand.get("sf") == sf
            ):
                return cand["queries"]
    return None


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = argv[0] if argv and not argv[0].startswith("-") else "/root/testdata/sf0.1"

    def opt(name: str, default: str) -> str:
        # bounds-checked (ADVICE r16): a flag passed as the last token used
        # to raise a bare IndexError; values that look like flags were
        # consumed silently
        if name not in argv:
            return default
        i = argv.index(name) + 1
        if i >= len(argv) or argv[i].startswith("--"):
            raise SystemExit(f"usage: {name} requires a value")
        return argv[i]

    cpus = opt("--cpus", "32")
    n_samples = int(opt("--samples", "7"))
    family = [q for q in opt("--queries", ",".join(DEFAULT_FAMILY)).split(",") if q]
    control = opt("--control", "neardup_jaccard")
    rounds = [int(r) for r in opt("--vs", "13,14,15").split(",")]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    from amazon_kinesis_data_analytics_flinktableapi_spark.engine import build_spark
    from amazon_kinesis_data_analytics_flinktableapi_spark.queries import REGISTRY

    todo = family + [control]
    unknown = [q for q in todo if q not in REGISTRY]
    if unknown:
        raise SystemExit(f"not in registry: {unknown}")

    spark = build_spark(app_name="ab_bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm JVM, untimed

    samples: dict[str, list[float]] = {q: [] for q in todo}
    for q in todo:  # per-query warmup: AQE-final codegen classes at this SF
        spark.catalog.clearCache()
        REGISTRY[q].fn(spark, sf_dir).count()
    for i in range(n_samples):
        # rotate the start offset each round: a slow window spanning one
        # round taxes a DIFFERENT leading query every time, so no single
        # query systematically absorbs window edges
        order = todo[i % len(todo):] + todo[: i % len(todo)]
        for q in order:
            spark.catalog.clearCache()
            t = time.perf_counter()
            REGISTRY[q].fn(spark, sf_dir).count()
            samples[q].append(round(time.perf_counter() - t, 3))
    spark.stop()

    prior = {n: _artifact_queries(n, repo, sf) or {} for n in rounds}
    hdr_rounds = "".join(f" r{n} |" for n in rounds)
    hdr_deltas = "".join(f" Δ vs r{n} |" for n in rounds)
    print(f"\nsf_dir={sf_dir} cpus={cpus} samples={n_samples} "
          f"(min-of-N, round-robin interleaved, control={control})")
    print(f"| query | quiet min |{hdr_rounds}{hdr_deltas} samples |")
    print(f"|---|---|{'---|' * (2 * len(rounds))}---|")
    for q in todo:
        mn = min(samples[q])
        cells = dlt = ""
        for n in rounds:
            v = prior[n].get(q)
            cells += f" {v:.3f} |" if v is not None else " — |"
            dlt += f" {(mn / v - 1) * 100:+.1f}% |" if v else " — |"
        tag = " (CONTROL)" if q == control else ""
        print(f"| {q}{tag} | {mn:.3f} s |{cells}{dlt} {samples[q]} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

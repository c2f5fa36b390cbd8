"""Full-registry adversarial parity sweep.

Runs EVERY oracle-checked registry query against the hostile fixture
dir from ``tests/test_adversarial_oracle.py`` (driver-exact schemas,
inputs the driver never generates: NULL keys/text/timestamps, empty and
single-row groups, ties, negatives) and hash-compares each against its
own DuckDB oracle on the SAME data.  The 10-query pytest module is the
permanent regression net; this sweep is the DISCOVERY tool — r10's
review sweep showed attested-green queries can still hide
input-dependent hazards (ANSI zero-division class), and this finds them
mechanically instead of by code reading.

Usage::

    python tools/adversarial_sweep.py [--only a,b,c] [--skip-streaming]

Output: one line per query (OK / MISMATCH / ERROR + first line of the
failure), then a summary block ready to triage.
"""

from __future__ import annotations

import argparse
import os
import sys
import traceback


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    ap.add_argument("--skip", default="", help="comma-separated names to skip")
    ap.add_argument(
        "--fixture", default="adv", choices=["adv", "skew", "nonfinite", "unicode"],
        help="adv = NULL/empty/tie hostile fixture; skew = hot-key fixture; "
        "nonfinite = NaN/±inf events.value rows (r14 audit edition: known-"
        "intolerant queries are expected to fail and are checked against "
        "tests.test_adversarial_oracle.NONFINITE_INTOLERANT — the sweep "
        "fails only on NEW intolerance or ledger rot); unicode = astral/"
        "combining/case-mapping/whitespace-zoo text rows (r14 wave 4, "
        "ledger UNICODE_INTOLERANT, same two-sided rot contract)",
    )
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    os.chdir(repo)

    import pytest  # noqa: F401  (tmp_path_factory replacement below)
    import tempfile
    from pathlib import Path

    from amazon_kinesis_data_analytics_flinktableapi_spark.engine import build_spark
    from amazon_kinesis_data_analytics_flinktableapi_spark.queries import all_specs
    from tests.oracle_util import compare, duck_connect

    # reuse the committed fixture builder so sweep and regression net can
    # never drift apart
    import tests.test_adversarial_oracle as adv

    tmp = Path(tempfile.mkdtemp(prefix="adv_sweep_"))

    class _Factory:
        def mktemp(self, name):
            p = tmp / name
            p.mkdir(parents=True, exist_ok=True)
            return p

    if args.fixture == "nonfinite":
        adv_dir = adv.make_nonfinite_dir(_Factory().mktemp("nonfinite_sf"))
    elif args.fixture == "unicode":
        adv_dir = adv.make_unicode_dir(_Factory().mktemp("unicode_sf"))
    else:
        builder = adv.adv_dir if args.fixture == "adv" else adv.skew_dir
        adv_dir = builder.__wrapped__(_Factory())

    spark = build_spark(app_name="adversarial_sweep", master="local[8]",
                        shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connect(adv_dir)

    specs = all_specs()
    names = sorted(specs)
    if args.only:
        names = [n for n in args.only.split(",") if n]
        unknown = [n for n in names if n not in specs]
        if unknown:
            # a typo must fail the invocation up front, not crash the
            # sweep mid-run with a raw KeyError (ADVICE r11)
            sys.exit(f"--only names not in registry: {unknown}")
    skip = {n for n in args.skip.split(",") if n}
    unknown_skip = [n for n in skip if n not in specs]
    if unknown_skip:
        # same contract as --only: a typoed skip must fail loudly, not
        # silently run the query it meant to exclude
        sys.exit(f"--skip names not in registry: {unknown_skip}")

    ok, mismatch, error, rows_only, skipped = [], [], [], [], []
    for name in names:
        if name in skip:
            skipped.append(name)
            continue
        spec = specs[name]
        try:
            df = spec.fn(spark, adv_dir)
            if spec.oracle is None:
                df.count()
                rows_only.append(name)
                print(f"{name}: rows-only", flush=True)
                continue
            compare(df, con, spec.oracle)
            ok.append(name)
            print(f"{name}: OK", flush=True)
        except AssertionError as e:
            mismatch.append(name)
            first = str(e).strip().splitlines()[0] if str(e).strip() else ""
            print(f"{name}: MISMATCH {first}", flush=True)
        except Exception as e:
            error.append(name)
            first = traceback.format_exception_only(type(e), e)[-1].strip()
            print(f"{name}: ERROR {first[:300]}", flush=True)

    print("\n=== SUMMARY ===")
    print(f"ok={len(ok)} mismatch={len(mismatch)} error={len(error)} "
          f"rows_only={len(rows_only)} skipped={len(skipped)}")
    if args.fixture in ("nonfinite", "unicode"):
        # the intolerance ledger: expected failures are fine, NEW failures
        # and ledger rot (a listed query now passing — harden landed, so
        # delist it) are not
        ledger = set(
            adv.NONFINITE_INTOLERANT if args.fixture == "nonfinite"
            else adv.UNICODE_INTOLERANT
        )
        failed = set(mismatch) | set(error)
        ran = set(ok) | failed
        new = sorted(failed - ledger)
        rot = sorted((ledger & ran) - failed)
        print(f"{args.fixture} ledger: expected_failed={len(failed & ledger)} "
              f"new_failures={new or 0} ledger_rot={rot or 0}")
        return 1 if (new or rot) else 0
    if mismatch:
        print("MISMATCH:", ",".join(mismatch))
    if error:
        print("ERROR:", ",".join(error))
    return 1 if (mismatch or error) else 0


if __name__ == "__main__":
    raise SystemExit(main())

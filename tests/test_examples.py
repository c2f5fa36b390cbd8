"""Smoke tests for the README-advertised examples (VERDICT r9 #4).

Both examples are showcase entry points (`examples/kinesis_migration_demo
.py` reproduces the reference topology end-to-end, `examples/pipeline_
demo.py` runs the training-data cleaning ladder); before r10 nothing ran
them, so the showcase path could rot silently while the suite stayed
green.  Each test runs the demo's ``main()`` and asserts the PRINTED
INVARIANTS — the numbers a reader of the demo output would sanity-check.

They run as subprocesses, not in-process: each demo builds its own
SparkSession via ``build_spark`` (getOrCreate) and calls ``spark.stop()``
at the end — in-process that would capture and then KILL the suite's
shared session fixture.  A subprocess is the same isolation the
README-documented invocation (`python examples/...`) has.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
import tempfile

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args: list[str], timeout: int = 420) -> str:
    proc = subprocess.run(
        [sys.executable, *args],
        cwd=_REPO,
        capture_output=True,
        text=True,
        timeout=timeout,
        env={**os.environ, "SPARK_LOCAL_IP": os.environ.get("SPARK_LOCAL_IP", "127.0.0.1")},
    )
    assert proc.returncode == 0, (
        f"{args} exited {proc.returncode}\nstdout:\n{proc.stdout[-4000:]}"
        f"\nstderr:\n{proc.stderr[-4000:]}"
    )
    return proc.stdout


def test_kinesis_migration_demo_invariants():
    out = _run(["examples/kinesis_migration_demo.py"])
    # [1] the reference join ran and produced rows
    m = re.search(r"\[1\] reference join: (\d+) rows \((\d+) rate-matched", out)
    assert m, out
    n, matched = int(m.group(1)), int(m.group(2))
    assert n >= 500 and 0 < matched <= n  # LEFT OUTER: every order survives
    # [2] the opaque-sequence adapter stack is wire-identical to the generator
    m = re.search(r"\[2\] sdk adapter stack: (\d+) records, wire-multiset mismatch = (\d+)", out)
    assert m, out
    assert int(m.group(1)) == 500 and int(m.group(2)) == 0
    # [3] the restored ledger served a deep read WITHOUT a horizon recount
    m = re.search(r"\[3\] restored ledger: read ordinals 9100-9110 \((\d+) records\) with only (\d+) inner calls", out)
    assert m, out
    assert int(m.group(1)) == 10
    assert int(m.group(2)) <= 6, "a horizon recount would need hundreds of inner calls"
    # [4] the reshard read crossed the split: parent closed at 200, two
    # children carry 300 each
    compact = out.replace(" ", "")
    sec4 = compact.split("[5]")[0]
    assert "shardId-000000000000|200" in sec4, out
    assert "shardId-000000000001|300" in sec4, out
    assert "shardId-000000000002|300" in sec4, out
    # [5] the two-generation chain: split children closed at 150 by the
    # merge, the merge child carries 150 and BOTH lineage fields
    sec5 = compact.split("[5]")[1]
    assert "shardId-000000000000|200" in sec5, out
    assert "shardId-000000000001|150" in sec5, out
    assert "shardId-000000000002|150" in sec5, out
    assert "shardId-000000000003|150" in sec5, out
    assert re.search(
        r"shardId-000000000003:ParentShardId=shardId-000000000001,"
        r"AdjacentParentShardId=shardId-000000000002",
        compact,
    ), out


def test_pipeline_demo_invariants():
    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    if not os.path.isdir(sf_dir):
        pytest.skip(f"testdata {sf_dir} not present")
    out_dir = tempfile.mkdtemp(prefix="pipeline_demo_test_")
    out = _run(["examples/pipeline_demo.py", sf_dir, out_dir])
    counts = {
        key: int(m.group(1))
        for key, pat in {
            "n0": r"input docs:\s+(\d+)",
            "n1": r"after quality\+lang:\s+(\d+)",
            "n2": r"after exact dedup:\s+(\d+)",
            "n3": r"after near-dup:\s+(\d+)",
            "n4": r"packed rows written:\s+(\d+)",
        }.items()
        if (m := re.search(pat, out))
    }
    assert set(counts) == {"n0", "n1", "n2", "n3", "n4"}, out
    # the cleaning ladder only ever removes rows, and packing preserves them
    assert counts["n0"] >= counts["n1"] >= counts["n2"] >= counts["n3"] > 0
    assert counts["n4"] == counts["n3"]
    # the corpus actually landed partitioned on disk
    assert any(d.startswith("seq_bucket=") for d in os.listdir(out_dir)), out_dir

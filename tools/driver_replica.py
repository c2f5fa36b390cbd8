"""Local replica of the driver's correctness gate.

Runs every registered query through ``__spark_entry__`` side-by-side with
its DuckDB oracle at a chosen scale factor and reports per-query
row-count/schema/value-hash agreement — the same compare the driver
records in ``CORRECTNESS_r{N}.json`` (columns sorted by name, rows
stringified and sorted, md5).

Usage::

    python tools/driver_replica.py [sf_dir] [--only name1,name2]

Defaults to /root/testdata/sf0.01 (the driver's gate scale).
"""

from __future__ import annotations

import hashlib
import os
import sys

# the script lives in tools/; __spark_entry__ and the package live at the
# repo root one level up
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def value_hash(rows, cols) -> str:
    ordered = sorted(cols)
    idx = [cols.index(c) for c in ordered]
    body = "\n".join(sorted("|".join(str(r[i]) for i in idx) for r in rows))
    return hashlib.md5(body.encode()).hexdigest()


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else "/root/testdata/sf0.01"
    only = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        # a bare builder defaults to a 1g driver heap, which survives the
        # gate's sf0.01 but OOM-kills the JVM (py4j ConnectionRefused) when
        # replicating at sf0.1; default 12g — deliberately under the
        # engine's build_spark 16g so a replica can run NEXT TO an engine
        # session on this 128 GiB host (raise via REPLICA_DRIVER_MEM for
        # sf>0.1).  Only applied at JVM launch — run in a fresh process.
        .config("spark.driver.memory", os.environ.get("REPLICA_DRIVER_MEM", "12g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    print(f"ENTRY rows: {df.count()} schema: {df.schema.simpleString()}")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    n_ok, n_rows_only, bad = 0, 0, []
    for name, fn in queries.items():
        if only is not None and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            if name in oracles:
                cur = con.execute(oracles[name])
                ocols = [d[0] for d in cur.description]
                orows = cur.fetchall()
                ok = value_hash(srows, sdf.columns) == value_hash(orows, ocols)
                status = "OK" if ok else "HASH-MISMATCH"
                if ok:
                    n_ok += 1
                else:
                    bad.append(name)
                print(f"{name}: spark={len(srows)} oracle={len(orows)} {status}", flush=True)
            else:
                n_rows_only += 1
                print(f"{name}: rows-only {len(srows)}", flush=True)
        except Exception as exc:  # noqa: BLE001 — report and continue, like the driver
            bad.append(name)
            print(f"{name}: ERROR {str(exc)[:200]}", flush=True)
    print(f"\nOK={n_ok} rows_only={n_rows_only} BAD={bad}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())

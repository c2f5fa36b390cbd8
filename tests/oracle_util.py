"""Local replica of the driver's DuckDB-oracle compare (sorted columns,
sorted rows, exact values) so mismatches surface at sf0.001 in pytest
before the driver's sf0.01 gate does."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) == 0:
        return df.reset_index(drop=True)
    # canonical row order: stringify every cell, sort lexicographically
    key = df.astype(str).agg("|".join, axis=1)
    df = df.iloc[key.argsort(kind="mergesort").to_numpy()].reset_index(drop=True)
    return df


def _arrow_kind(dt) -> str:
    import pyarrow as pa

    if pa.types.is_integer(dt):
        return "int"
    if pa.types.is_floating(dt):
        return "float"
    if pa.types.is_decimal(dt):
        return "decimal"
    return "other"


def _spark_kind(dt: str) -> str:
    if dt in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    if dt in ("float", "double"):
        return "float"
    if dt.startswith("decimal"):
        return "decimal"
    return "other"


def _assert_types_align(spark_df, arrow_tbl) -> None:
    """The driver's compare is TYPED: DuckDB HUGEINT (sum over int) arrives
    as decimal128 and hash-mismatches a Spark BIGINT even when values agree.
    pandas fetchdf() silently coerces HUGEINT→float64, which is exactly how
    three r1 mismatches passed locally — so check Spark's declared schema
    against the oracle's Arrow-level types (NOT pandas dtypes: an int column
    with NULLs arrives in pandas as float64 on both sides, an artifact)."""
    duck_types = {f.name: f.type for f in arrow_tbl.schema}
    for c, sdt in spark_df.dtypes:
        if c not in duck_types:
            continue  # the column-set assertion below reports this properly
        sk, dk = _spark_kind(sdt), _arrow_kind(duck_types[c])
        assert dk != "decimal" or sk == "decimal", (
            f"{c}: oracle returns DuckDB HUGEINT/DECIMAL ({duck_types[c]}) vs spark {sdt} — "
            f"CAST the aggregate to BIGINT/DOUBLE in the oracle SQL"
        )
        if {sk, dk} <= {"int", "float"}:
            assert sk == dk, f"{c}: spark type {sdt} vs oracle {duck_types[c]}"


def compare(spark_df, con: duckdb.DuckDBPyConnection, oracle_sql: str, float_tol: float = 0.0) -> None:
    spark_pdf = spark_df.toPandas()
    arrow_tbl = con.execute(oracle_sql).fetch_arrow_table()
    _assert_types_align(spark_df, arrow_tbl)
    got = _normalize(spark_pdf)
    want = _normalize(arrow_tbl.to_pandas())
    assert list(got.columns) == list(want.columns), f"columns: {list(got.columns)} vs {list(want.columns)}"
    assert len(got) == len(want), f"row count: {len(got)} vs {len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            for i, (a, b) in enumerate(zip(g, w)):
                an, bn = pd.isna(a), pd.isna(b)
                assert an == bn, f"{c}[{i}]: null mismatch {a} vs {b}"
                if not an:
                    ok = a == b if float_tol == 0.0 else math.isclose(a, b, rel_tol=float_tol, abs_tol=float_tol)
                    assert ok, f"{c}[{i}]: {a!r} != {b!r}"
        else:
            ga, wa = g.astype(str), w.astype(str)
            bad = (ga != wa).to_numpy().nonzero()[0]
            assert len(bad) == 0, f"{c}: first diff at row {bad[0] if len(bad) else 0}: {g.iloc[bad[0]]!r} vs {w.iloc[bad[0]]!r}"

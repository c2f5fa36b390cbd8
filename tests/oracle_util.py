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


def compare(spark_df, con: duckdb.DuckDBPyConnection, oracle_sql: str, float_tol: float = 0.0) -> None:
    got = _normalize(spark_df.toPandas())
    want = _normalize(con.execute(oracle_sql).fetchdf())
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

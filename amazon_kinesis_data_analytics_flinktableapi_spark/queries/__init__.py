"""Oracle-checked query library (the driver contract, SURVEY.md §2).

Each :class:`QuerySpec` pairs a Spark implementation (DataFrame-native or
engine SQL) with the equivalent ANSI SQL that DuckDB runs on the same
parquet tables.  Column names/aliases are identical on both sides — the
driver's compare sorts columns by name before value-hashing.

``REGISTRY`` is the single source of truth consumed by ``__spark_entry__``
(driver), ``bench.py`` (headline set), and ``tests/test_oracle.py`` (local
sf0.001 replica of the driver's sf0.01 gate).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    #: DuckDB-runnable ANSI SQL over pre-registered views; None → the driver
    #: records a weaker rows-only check (non-SQL-expressible ops).
    oracle: str | None
    #: included in bench.py's headline timing set
    headline: bool = False
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(spec: QuerySpec) -> QuerySpec:
    if spec.name in REGISTRY:
        raise ValueError(f"duplicate query name: {spec.name}")
    REGISTRY[spec.name] = spec
    return spec


def query(name: str, oracle: str | None, headline: bool = False, doc: str = ""):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn):
        register(QuerySpec(name=name, fn=fn, oracle=oracle, headline=headline, doc=doc or fn.__doc__ or ""))
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, *tables: str) -> list[DataFrame]:
    """Read TESTDATA parquet tables and register them as temp views."""
    from amazon_kinesis_data_analytics_flinktableapi_spark.sources.batch import read_table

    out = []
    for t in tables:
        df = read_table(spark, sf_dir, t)
        df.createOrReplaceTempView(t)
        out.append(df)
    return out


# import side-effect: populate REGISTRY
from amazon_kinesis_data_analytics_flinktableapi_spark.queries import (  # noqa: E402,F401
    advanced,
    arrays_windows,
    extras,
    llm,
    pipeline_ops,
    reference,
    relational,
)

_ALL_MODULES = [reference, relational, llm, advanced, extras, arrays_windows, pipeline_ops]


def all_specs() -> dict[str, QuerySpec]:
    return dict(REGISTRY)

"""Vector math over ``array<float>`` embedding columns.

All pure built-in expressions (``F.zip_with`` / ``F.aggregate``) — the dot
product runs inside codegen, no Python round-trip, so brute-force similarity
stays scan-bound.  Arithmetic is promoted to double *before* accumulation:
left-to-right double summation is deterministic and matches how the DuckDB
oracle evaluates the same expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column | str) -> Column:
    c = F.col(vec) if isinstance(vec, str) else vec
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity = dot(a,b) / (|a|·|b|), computed in double."""
    ad, bd = as_double(a), as_double(b)
    return dot(ad, bd) / (norm(ad) * norm(bd))


def l2_distance(a: Column | str, b: Column | str) -> Column:
    ad, bd = as_double(a), as_double(b)
    diff = F.zip_with(ad, bd, lambda x, y: (x - y) * (x - y))
    return F.sqrt(F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x))

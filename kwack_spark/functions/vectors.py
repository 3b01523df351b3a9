"""Vector math over array<float> embedding columns — pure built-in
higher-order functions (zip_with / aggregate), JVM-side, no UDF.

Determinism: dot products left-fold in element order with double
accumulation, matching DuckDB's list_dot_product evaluation order, so cosine
scores are bit-comparable across engines (verified in tests).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))

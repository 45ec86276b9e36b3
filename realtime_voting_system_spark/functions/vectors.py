"""Vector math over ``array<float>`` embedding columns — built-in HOFs only.

``zip_with`` + ``aggregate`` run in the JVM; accumulation is left-to-right in
array-index order, which makes dot products bit-deterministic and matches
DuckDB's ``list_dot_product`` evaluation order (verified in tests).

Embeddings are cast float→double BEFORE any arithmetic (exact widening in
both engines) so products/sums are computed identically.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (index order ⇒ deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """cos(a,b) = dot/(|a|*|b|) — each step a single correctly-rounded IEEE
    op in fixed order; bit-stable across engines given identical inputs."""
    return dot(a, b) / (norm(a) * norm(b))

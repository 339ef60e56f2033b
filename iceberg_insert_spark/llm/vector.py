"""Shared vector math over array<float> columns — pure JVM higher-order
functions (zip_with / aggregate), no Python in the loop.

Everything computes in DOUBLE: the stored embeddings are float32 and both
engines' float arithmetic must agree after the documented rounding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-order double dot product (matches DuckDB list_dot_product)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))

"""Vector expressions over ``array<float>`` embedding columns.

Similarity-search scope (north star). Dot/norm/cosine are built from Spark's
higher-order array functions (``zip_with`` / ``aggregate`` / ``transform``)
— JVM-side lambdas, Arrow-free, no Python in the hot path. Elements are cast
to double *before* multiply so the arithmetic matches a double-precision
oracle bit-for-bit at practical tolerances.

Scale notes: brute-force cosine top-k over 100 TB of vectors is a single
narrow map + one TakeOrdered — no shuffle of the vector data itself. The LSH
variant (operators/similarity.py) bounds the candidate set instead.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm2(a: Column) -> Column:
    ad = _as_double(a)
    sq = F.aggregate(
        F.zip_with(ad, ad, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    return F.sqrt(sq)


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity with guarded zero-norm division (NULL, not inf)."""
    denom = norm2(a) * norm2(b)
    return F.when(denom == F.lit(0.0), F.lit(None).cast("double")).otherwise(
        dot(a, b) / denom
    )

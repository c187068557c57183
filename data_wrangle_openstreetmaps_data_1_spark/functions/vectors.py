"""Vector math over ``array<float/double>`` embedding columns, as pure
column expressions (``zip_with`` + ``aggregate`` stay JVM-side; no Python).

Used by the similarity-search operators (operators/similarity.py). At 100 TB
the expression form matters: a row-at-a-time Python UDF here would dominate
the job; these compile into codegen'd loops over the array.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    # try_divide: a zero vector has no direction — cosine is NULL, not a
    # DIVIDE_BY_ZERO crash (ANSI mode). NULL drops out of >= tau filters and
    # sorts last under desc ordering, which is the wanted semantics.
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def l2_dist(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )

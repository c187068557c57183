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


def literal_fold_sql(vec_col: str, values: list[float], term: str = "dot") -> str:
    """SQL string folding ``vec_col`` against a LITERAL vector — the shared
    builder behind sign-LSH buckets (similarity) and k-means distances
    (clustering). One JVM parse instead of py4j literal round-trips, and the
    left-fold order matches DuckDB's ``list_reduce`` exactly, which is what
    keeps cross-engine float parity (do not change the accumulator shape in
    one caller only).

    ``term``: 'dot' -> sum(a*b); 'l2sq' -> sum((a-b)^2).
    """
    arr = ", ".join(repr(float(x)) + "D" for x in values)
    body = {"dot": "a * b", "l2sq": "(a - b) * (a - b)"}[term]
    return (
        f"aggregate(zip_with({vec_col}, array({arr}), (a, b) -> {body}), "
        f"cast(0.0 as double), (acc, v) -> acc + v)"
    )


def l2_dist(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )

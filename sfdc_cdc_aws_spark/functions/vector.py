"""Vector column expressions (JVM-side, no Python in the hot path).

Dot products and norms are left-to-right folds over ``zip_with`` /
``aggregate`` higher-order functions — sequential accumulation in
double, matching DuckDB's list_* functions closely enough that
results rounded to 6 decimals are hash-identical across engines
(ranking always uses the rounded value + id tiebreak so order can
never diverge on a final-ulp difference).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

COS_SCALE = 6  # round cosine to this many decimals everywhere


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return F.round(dot(a, b) / (norm(a) * norm(b)), COS_SCALE)


def cosine_prenorm(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine with the per-vector norms precomputed *below* a join
    boundary, so each pair costs one dot product instead of three
    array folds. Same float association as :func:`cosine`
    (``round(dot/(na*nb), 6)``) — hash-identical results."""
    return F.round(dot(a, b) / (norm_a * norm_b), COS_SCALE)


# DuckDB twin of cosine() — {a}/{b} are list-of-float SQL expressions
DUCK_COSINE = (
    "round(list_cosine_similarity(CAST({a} AS DOUBLE[]), "
    "CAST({b} AS DOUBLE[])), 6)"
)

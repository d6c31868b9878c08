"""Vector math over ``array<float>`` embedding columns — pure expressions.

Used by the similarity-search operators (SURVEY.md §2.M). Everything is
``F.zip_with`` / ``F.aggregate`` over array columns: JVM-side, codegen'd, no
Python. All arithmetic is promoted to double so results are reproducible
across engines (the DuckDB oracle does the same)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _dsum(arr: Column) -> Column:
    """Left-fold sum of a double array (index order, double accumulator)."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two equal-length numeric arrays -> double."""
    prods = F.zip_with(
        _col(a), _col(b), lambda x, y: x.cast("double") * y.cast("double")
    )
    return _dsum(prods)


def l2_norm(a: Column | str) -> Column:
    """Euclidean norm -> double."""
    a = _col(a)
    return F.sqrt(_dsum(F.transform(a, lambda x: x.cast("double") * x.cast("double"))))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity -> double (NULL when either norm is 0)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0, F.lit(None).cast("double")).otherwise(dot(a, b) / denom)

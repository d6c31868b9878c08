"""Random-projection (Johnson–Lindenstrauss) dimensionality reduction
for embedding columns.

The missing rung under the vector-compression ladder (PQ/SQ/BQ): instead
of quantizing codes, SHRINK the dimension itself. A seeded Gaussian
matrix R (out_dim × in_dim, entries N(0,1)/sqrt(out_dim)) maps
``array<float>[in_dim] → array<double>[out_dim]`` while approximately
preserving pairwise Euclidean distances and inner products (JL lemma) —
so downstream LSH/IVF/exact re-rank run on vectors 4–16× smaller.

Scale design (100 TB):
- The projection is ONE nested array literal traversed by index-lambdas
  (the ``pq._books_lit`` plan-size discipline: ~3 HOF nodes regardless of
  out_dim·in_dim, not one dot-product expression per output dim).
- Column→Column, zero UDFs, no shuffle: projection pipelines inside the
  scan stage; the matrix is a plan constant, never broadcast state.
- ``cosine_topk_rp`` = project both sides → brute-force on the SMALL
  vectors → exact re-rank on raw vectors via the shared
  ``similarity.exact_cosine_rerank`` stage. The all-pairs term still
  scales with corpus size (like every brute-force tier) but its constant
  drops by in_dim/out_dim; for sub-linear candidate generation compose
  with the IVF/LSH tiers instead.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from unified_firmographic_data_pipeline_spark.functions.vectors import _dsum


def gaussian_matrix(
    out_dim: int, in_dim: int, seed: int = 42
) -> list[list[float]]:
    """Seeded JL projection matrix: ``out_dim`` rows of ``in_dim``
    N(0, 1/out_dim) entries. Deterministic in ``seed`` so the projection
    is reproducible across runs/engines (same contract as the seeded LSH
    planes embedded in the oracle SQL)."""
    if out_dim < 1 or in_dim < 1:
        raise ValueError("dimensions must be >= 1")
    rnd = random.Random(seed)
    scale = 1.0 / math.sqrt(out_dim)
    return [
        [rnd.gauss(0, 1) * scale for _ in range(in_dim)] for _ in range(out_dim)
    ]


def _matrix_lit(matrix: list[list[float]]) -> Column:
    """The whole projection as ONE nested (out_dim × in_dim) literal —
    see ``pq._books_lit`` for why inline per-row expressions explode
    Catalyst analysis time."""
    return F.array(
        *[F.array(*[F.lit(float(v)) for v in row]) for row in matrix]
    )


def project(vec_col: Column | str, matrix: list[list[float]]) -> Column:
    """``R · v`` as a pure Column: ``array<double>[out_dim]``.

    Implemented as a transform over the matrix-row literal with a
    zip_with dot product per output dim — no UDF, no shuffle. NULL
    vectors project to NULL (fold over NULL is NULL), preserving the
    null-strict encoder contract of the PQ/SQ tiers."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.transform(
        _matrix_lit(matrix),
        lambda row: _dsum(F.zip_with(row, v, lambda a, b: a * b)),
    )


def project_df(
    df: DataFrame,
    matrix: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "embedding_rp",
) -> DataFrame:
    """Add the projected column; rows whose vector length differs from
    the matrix's in_dim produce NULL (zip_with stops at the shorter
    side, which would silently truncate — guarded explicitly)."""
    in_dim = len(matrix[0])
    proj = F.when(F.size(vec_col) == in_dim, project(vec_col, matrix))
    return df.withColumn(out_col, proj)


def cosine_topk_rp(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    out_dim: int = 16,
    shortlist: int = 50,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN tier: JL-project to ``out_dim``, brute-force cosine on the
    projected vectors for a ``shortlist``, exact re-rank on raw vectors.

    Output ``(query_id, neighbor_id, cosine_sim, rank)`` — identical
    contract to every other tier, so it slots into the same oracle twin
    (the exact tier) for recall checks."""
    from unified_firmographic_data_pipeline_spark.operators.similarity import (
        cosine_topk,
        exact_cosine_rerank,
    )

    first = (
        corpus.filter(F.col(vec_col).isNotNull()).select(vec_col).head(1)
    )
    if not first:
        raise ValueError(
            f"cosine_topk_rp: corpus has no non-null '{vec_col}' rows — "
            "cannot infer the input dimension for the projection matrix"
        )
    in_dim = len(first[0][0])
    mat = gaussian_matrix(out_dim, in_dim, seed)
    c_p = project_df(corpus, mat, vec_col, "__rp").select(
        id_col, F.col("__rp").alias(vec_col)
    )
    q_p = project_df(queries, mat, vec_col, "__rp").select(
        id_col, F.col("__rp").alias(vec_col)
    )
    cand = cosine_topk(c_p, q_p, k=shortlist, id_col=id_col, vec_col=vec_col).select(
        "query_id", "neighbor_id"
    )
    return exact_cosine_rerank(
        cand, corpus, queries, k, vec_col=vec_col, id_col=id_col
    )

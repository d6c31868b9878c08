"""Scalar quantization (SQ8) — the int8 ANN compression tier.

The standard first rung of the vector-compression ladder (as in FAISS's
``ScalarQuantizer`` and most vector stores): learn per-dimension
[min, max] bounds over the corpus, affine-map every component to an
8-bit code, and search with asymmetric distance — the query stays
float, corpus components are reconstructed from their codes on the
fly. 4x smaller than float32 with far milder recall loss than PQ
(per-component, not per-subspace, quantization), at the cost of a
smaller compression factor; PQ (``operators/pq.py``) is the next rung.

Scale shape:

- training: ONE pass computing 2·d min/max aggregates (map-side
  partial agg, bounded 2·d scalars to the driver) — cheaper than PQ's
  Lloyd rounds, no iteration.
- encoding: a zip_with projection fused into the scan, no shuffle.
- search: broadcast queries onto the codes scan; per pair the distance
  reconstructs each component with one multiply-add from the bounds
  literal. Per-partition top-k via the same window shape as
  ``similarity.cosine_topk``.

Plan-size discipline (the ``pq._books_lit`` lesson): the bounds ride
the plan as TWO d-element array literals traversed by zip_with — HOF
node count is constant in d.

Distances are integer micro-units (round((q-recon)^2·1e6) summed as
long), and reconstructions round to 6 digits first — bit-reproducible
across runs, partitionings and engines. L2 over ``l2_normalized``
vectors is monotone with cosine (see ``pq.l2_normalized``), so this
serves cosine queries the same way the PQ tier does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: bounds[i] = (lo, hi) for dimension i
Bounds = list[tuple[float, float]]


def sq_train(
    corpus: DataFrame, vec_col: str = "embedding", dim: int = 64
) -> Bounds:
    """Per-dimension [min, max] over the corpus — one aggregate pass,
    2·d bounded scalars back to the driver."""
    aggs = []
    for i in range(dim):
        # try_element_at: ANSI mode's element_at RAISES past the array
        # end — short/malformed vectors must contribute NULL (skipped by
        # min/max), not kill the training job
        e = F.try_element_at(F.col(vec_col), F.lit(i + 1)).cast("double")
        aggs.append(F.min(e).alias(f"lo{i}"))
        aggs.append(F.max(e).alias(f"hi{i}"))
    row = corpus.agg(*aggs).collect()[0]
    if any(row[f"lo{i}"] is None for i in range(dim)):
        raise ValueError(
            f"sq_train: corpus is empty or some dimension < {dim} has no "
            "non-NULL values (min/max aggregated to NULL)"
        )
    return [(float(row[f"lo{i}"]), float(row[f"hi{i}"])) for i in range(dim)]


def _lo_lit(bounds: Bounds):
    return F.array(*[F.lit(float(lo)) for lo, _ in bounds])


def _scale_lit(bounds: Bounds):
    """Per-dimension code->value scale (hi-lo)/255; 0 for degenerate
    dimensions (constant value: every code decodes to lo)."""
    return F.array(
        *[F.lit((float(hi) - float(lo)) / 255.0 if hi > lo else 0.0) for lo, hi in bounds]
    )


def _codes_col(bounds: Bounds, vec_col: str):
    """array<int> SQ codes for one row: clamp(round((x-lo)/scale), 0, 255).

    NULL-STRICT on purpose: a missing component (NULL element, or a
    wrong-length vector — ``zip_with`` pads the short side with NULLs)
    must produce a NULL code, not a fabricated one. The naive
    ``least(255, greatest(0, round(null/s)))`` silently becomes 0
    because Spark's least/greatest IGNORE null arguments — which would
    let a malformed row reconstruct as a legitimate-looking point and
    outrank real candidates."""
    lo, sc = _lo_lit(bounds), _scale_lit(bounds)
    shifted = F.zip_with(F.col(vec_col), lo, lambda x, l: x.cast("double") - l)
    # clamp in the DOUBLE domain, cast int last: ANSI mode turns an
    # int cast of an extreme out-of-range ratio (round(1e12/s)) into a
    # CAST_OVERFLOW error instead of the documented edge-code saturation
    return F.zip_with(
        shifted,
        sc,
        lambda d, s: F.when(d.isNull(), F.lit(None).cast("int")).otherwise(
            F.least(
                F.lit(255.0),
                F.greatest(
                    F.lit(0.0),
                    F.when(s == 0, F.lit(0.0)).otherwise(F.round(d / s)),
                ),
            ).cast("int")
        ),
    )


def sq_encode(
    corpus: DataFrame,
    bounds: Bounds,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, codes) with ``codes[i]`` = clamp(round((x-lo)/scale), 0, 255)
    — one zip_with projection, no shuffle. Out-of-bounds components
    (queries/new data beyond the trained range) clamp to the edge code,
    the standard SQ saturation behavior; missing components stay NULL
    (see :func:`_codes_col`), so malformed rows get NULL distances and
    sort behind every real candidate."""
    return corpus.select(F.col(id_col), _codes_col(bounds, vec_col).alias("codes"))


def _recon(codes_col, bounds: Bounds):
    """Reconstructed float components from codes: lo + code·scale,
    rounded to 6 digits for bit-reproducibility."""
    lo, sc = _lo_lit(bounds), _scale_lit(bounds)
    return F.zip_with(
        F.zip_with(codes_col, sc, lambda c, s: c.cast("double") * s),
        lo,
        lambda v, l: F.round(v + l, 6),
    )


def _asym_dist_micro(qv_col, codes_col, bounds: Bounds):
    """Integer-micro squared L2 between a float query-vector column and
    the reconstruction of an SQ code column — the asymmetric distance
    shared by ``sq_topk``, ``sq_topk_ivf`` and
    ``ann_index.search_ivf_sq_index`` (one definition so the inline
    tiers and the materialized index can never diverge)."""
    return F.aggregate(
        F.zip_with(
            qv_col,
            _recon(codes_col, bounds),
            lambda x, r: F.round(
                (x.cast("double") - r) * (x.cast("double") - r) * 1e6
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, s: acc + s,
    )


def sq_topk(
    codes: DataFrame,
    queries: DataFrame,
    bounds: Bounds,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric SQ search: float query vs reconstructed corpus
    components, integer-micro squared L2, id-tiebroken top-k. Output
    ``(query_id, neighbor_id, sq_dist_micro, rank)``; approximate only
    through quantization (every corpus row is scored — compose with the
    IVF coarse tier for scan reduction, exactly as ``pq_topk_ivf``
    does for PQ)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = codes.select(F.col(id_col).alias("neighbor_id"), "codes")
    dist = _asym_dist_micro(F.col("__qv"), F.col("codes"), bounds)
    scored = c.join(
        F.broadcast(q), F.col("query_id") != F.col("neighbor_id")
    ).select("query_id", "neighbor_id", dist.alias("sq_dist_micro"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sq_dist_micro").asc_nulls_last(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def sq_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    bounds: Bounds,
    k: int = 10,
    n_lists: int = 8,
    n_probe: int = 2,
    shortlist: int = 50,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-SQ — the coarse-list composition for the SQ8 tier, the exact
    analogue of ``pq.pq_topk_ivf``: corpus rows file under their nearest
    of ``n_lists`` coarse centroids and store int8 codes; a query probes
    its ``n_probe`` nearest lists via the list-id equi-join (only
    probed-list code rows shuffle), asymmetric SQ distance shortlists
    ``shortlist`` candidates, and the survivors get the exact cosine
    re-rank. Scan cost is (n_probe/n_lists) of the corpus in ~25% of
    the bytes; recall loss comes only from unprobed lists plus the mild
    per-component quantization. Deterministic end to end. Output
    ``(query_id, neighbor_id, cosine_sim, rank)``."""
    from unified_firmographic_data_pipeline_spark.operators.clustering import (
        assign_clusters,
        init_centroids_by_id,
        probe_lists_expr,
    )
    from unified_firmographic_data_pipeline_spark.operators.similarity import (
        exact_cosine_rerank,
    )

    centroids = init_centroids_by_id(corpus, n_lists, vec_col, id_col)
    codes = assign_clusters(corpus, centroids, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        _codes_col(bounds, vec_col).alias("codes"),
        F.col("cluster_id").alias("__list"),
    )
    probes = probe_lists_expr(centroids, n_probe, vec_col)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.explode(probes).alias("__list"),
    )
    dist = _asym_dist_micro(F.col("__qv"), F.col("codes"), bounds)
    scored = (
        codes.join(F.broadcast(q), "__list")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", dist.alias("sq_dist_micro"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sq_dist_micro").asc_nulls_last(), F.col("neighbor_id").asc()
    )
    cand = scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= shortlist
    )
    return exact_cosine_rerank(cand, corpus, queries, k, vec_col, id_col)

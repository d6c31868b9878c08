"""K-means clustering over embedding columns — Lloyd's iterations as plain
DataFrame ops (no MLlib dependency, no RDDs).

Corpus curation uses k-means for semantic dedup/diversity balancing
(cluster, then cap documents per cluster). The scale shape per iteration:

- assignment: centroids are a BROADCAST literal (k·d doubles — a few KB);
  each row computes k squared distances in one codegen'd projection. No
  shuffle, no join.
- update: ``posexplode`` the vector, one groupBy (cluster, dim) shuffle of
  (k·d partial sums per map task thanks to partial aggregation), collect
  k·d means to the driver (bounded-scalar tier, same as watermark reads).

The logical plan stays flat across iterations because centroids re-enter
as fresh literals each round — no lineage growth, no checkpoint needed
(contrast the connected-components loop in operators/components.py, where
the iterated state is a DataFrame and ``localCheckpoint`` is mandatory).

Distances in :func:`assign_clusters` are INTEGER micro-unit sums
(``round((x-y)^2 * 1e6)`` summed as long): order-independent and therefore
bit-identical in any engine — the property the DuckDB oracle relies on.
The tiny quantization (≤0.5e-6 per dim) is irrelevant for clustering and
is applied identically everywhere.
"""

from __future__ import annotations


from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Centroid = tuple[int, list[float]]


def _sq_dist_micro(vec: F.Column, centroid: list[float]) -> F.Column:
    # zip_with/aggregate fold, NOT per-dimension unrolled expressions: the
    # unrolled form (k*d = 512 getItem/round/add terms inside one
    # array_min(array(struct(...)))) blows past the 64KB whole-stage-codegen
    # method limit, falls back to interpreted mode AND takes ~40s of
    # Catalyst analysis vs ~1s for this fold (measured at k=8, d=64). The
    # HOF lambda is evaluated per element but over a compact expression
    # tree; the integer sum is order-independent either way.
    lit = F.array(*[F.lit(float(v)) for v in centroid])
    sq = F.zip_with(
        vec,
        lit,
        lambda x, y: F.round(
            (x.cast("double") - y) * (x.cast("double") - y) * 1e6
        ).cast("long"),
    )
    return F.aggregate(sq, F.lit(0).cast("long"), lambda acc, s: acc + s)


def assign_clusters(
    df: DataFrame, centroids: list[Centroid], vec_col: str = "embedding"
) -> DataFrame:
    """Adds ``cluster_id`` (argmin centroid, id tiebreak) and ``dist_micro``
    (squared L2 to it, in 1e-6 units). One narrow projection: the k
    distance expressions live in the same whole-stage-codegen span as the
    scan."""
    # the coalesce below exists ONLY for the nullability fold; assert the
    # degenerate empty-centroid call away so its -1 fallback is provably
    # dead (it would otherwise mask a caller bug with an inconsistent
    # cluster_id=-1 / dist_micro=NULL sentinel)
    if not centroids:
        raise ValueError("assign_clusters requires at least one centroid")
    candidates = F.array(
        *[
            F.struct(
                _sq_dist_micro(F.col(vec_col), c).alias("d"),
                F.lit(int(cid)).alias("cid"),
            )
            for cid, c in centroids
        ]
    )
    best = F.array_min(candidates)
    # cluster_id is provably non-null (every candidate struct carries a
    # literal cid and the array is non-empty), but getField() is nullable
    # to Catalyst — so an equi-join on cluster_id infers IsNotNull and
    # pushes it below the exchange, RE-EVALUATING all k distance folds in
    # the scan-side filter (measured: a duplicate 0.96 s one-task stage in
    # the IVF queries at sf0.1). coalesce with a literal makes the
    # non-nullability visible and the inferred filter folds to true.
    return df.withColumn("cluster_id", F.coalesce(best["cid"], F.lit(-1))).withColumn(
        "dist_micro", best["d"]
    )


def init_centroids_by_id(
    df: DataFrame, k: int, vec_col: str = "embedding", id_col: str = "vec_id"
) -> list[Centroid]:
    """Deterministic init: the k rows with the smallest ids. (k·d driver
    values — bounded-scalar tier.) Seeded-random inits are layout-dependent;
    id order is reproducible everywhere."""
    rows = df.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    return [(int(r[id_col]), [float(v) for v in r[vec_col]]) for r in rows]


def kmeans_fit(
    df: DataFrame,
    k: int,
    n_iter: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[list[Centroid], DataFrame]:
    """Lloyd's algorithm. Returns (final centroids, assignment DataFrame).

    Per iteration one shuffle (the (cluster, dim) mean) and one k·d driver
    collect; empty clusters keep their previous centroid (standard
    fallback). Converged when assignments stop changing is not checked —
    fixed ``n_iter`` keeps the job graph static and predictable."""
    centroids = init_centroids_by_id(df, k, vec_col, id_col)
    for _ in range(n_iter):
        assigned = assign_clusters(df, centroids, vec_col)
        means = (
            assigned.select("cluster_id", F.posexplode(vec_col).alias("pos", "x"))
            .groupBy("cluster_id", "pos")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .groupBy("cluster_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("centroid")
            )
            .collect()
        )
        new = {int(r["cluster_id"]): [float(v) for v in r["centroid"]] for r in means}
        centroids = [(cid, new.get(cid, old)) for cid, old in centroids]
    return centroids, assign_clusters(df, centroids, vec_col)


def cluster_sizes(assigned: DataFrame) -> DataFrame:
    """Per-cluster count + total within-cluster squared distance (micro
    units) — the inertia decomposition used to monitor convergence."""
    return assigned.groupBy("cluster_id").agg(
        F.count("*").alias("n_vecs"),
        F.sum("dist_micro").alias("inertia_micro"),
    )


def semantic_dedup_cap(
    assigned: DataFrame, per_cluster_cap: int, id_col: str = "vec_id"
) -> DataFrame:
    """Diversity-preserving downsample: keep at most ``per_cluster_cap``
    rows per cluster, nearest-to-centroid first (id tiebreak) — the
    SemDeDup-style 'prune dense regions' step expressed as one window
    rank-filter."""
    from pyspark.sql import Window

    # asc_nulls_last: Spark's default asc is NULLS FIRST, so a NULL
    # distance (malformed vector) would hog a cap slot ahead of every
    # real row — same contract as the PQ/SQ shortlist windows
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("dist_micro").asc_nulls_last(), F.col(id_col).asc()
    )
    return (
        assigned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= per_cluster_cap)
        .drop("__rn")
    )


def probe_lists_expr(centroids: list[Centroid], n_probe: int, vec_col: str):
    """array<int> of the ``n_probe`` nearest coarse-centroid ids for one
    row — the IVF probe selector shared by every composed tier
    (pq.pq_topk_ivf, sq.sq_topk_ivf, ann_index.search_ivf_sq_index), so
    a tie-break or ordering change can never diverge the inline tiers
    from the materialized index that is pinned bit-identical to them."""
    return F.transform(
        F.slice(
            F.array_sort(
                F.array(
                    *[
                        F.struct(
                            _sq_dist_micro(F.col(vec_col), ce).alias("d"),
                            F.lit(int(cid)).alias("cid"),
                        )
                        for cid, ce in centroids
                    ]
                )
            ),
            1,
            n_probe,
        ),
        lambda s: s["cid"],
    )

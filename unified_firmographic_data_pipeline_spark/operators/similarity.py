"""Similarity search over embedding columns (``array<float>``).

SURVEY.md §2.M: brute-force cosine top-k as the exact baseline, plus an
LSH-bucketed approximate variant as the 100 TB scale path.

Scale design: the exact variant broadcasts the (small) query set against the
(huge) corpus — a broadcast nested-loop the optimizer pipelines with the
scan; per-partition top-k then a final window keeps shuffle traffic at
``O(queries × k × partitions)``, never the corpus. The approximate variant
buckets both sides with random-hyperplane signatures so only same-bucket
pairs are scored (equi-join shuffle on the bucket key).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from unified_firmographic_data_pipeline_spark.functions.vectors import dot, l2_norm


def _cosine_from_norms(a: str, b: str, na: str, nb: str):
    """Cosine from per-row precomputed norms: ``dot(a,b)/(na*nb)`` with the
    NULL-on-zero-norm contract of :func:`cosine_similarity`. Catalyst does
    not CSE array folds into join-side reuse, so inlining
    ``cosine_similarity`` costs THREE folds per scored pair; precomputing
    each side's norm once per row (linear) leaves one fold per pair —
    measured ~3x on the brute-force tiers. The arithmetic (fold order,
    ``||a||*||b||`` product order) is identical, so results are bit-equal."""
    denom = F.col(na) * F.col(nb)
    return F.when(denom == 0, F.lit(None).cast("double")).otherwise(
        dot(a, b) / denom
    )


def exact_cosine_rerank(
    cand: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """The shared re-rank stage of every shortlist-based ANN tier
    (PQ/IVF-PQ/IVF-SQ/BQ): join ``cand`` — (query_id, neighbor_id)
    pairs, queries x shortlist rows, never the corpus — back to raw
    vectors and rank by exact cosine. BOTH small sides broadcast (cand
    is bounded by queries x shortlist, the query set by contract), so
    the corpus side is one map-side semi-join over the scan with no
    shuffle. Norms are computed AFTER the join, on shortlist survivors
    only — precomputing them per corpus row (the all-pairs tiers' trick,
    :func:`_cosine_from_norms`) would here pay an O(d) fold for every
    corpus row to save work on a few thousand candidates. Same fold,
    same product order, so results are bit-equal either way. Output
    ``(query_id, neighbor_id, cosine_sim, rank)``, id tiebreaks."""
    qvec = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        l2_norm(vec_col).alias("__qn"),
    )
    scored = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
        )
        .join(F.broadcast(cand.select("query_id", "neighbor_id")), "neighbor_id")
        .join(F.broadcast(qvec), "query_id")
        .withColumn("__cn", l2_norm("__cv"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_cosine_from_norms("__qv", "__cv", "__qn", "__cn"), 6).alias(
                "cosine_sim"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 6,
) -> DataFrame:
    """Exact brute-force top-k cosine neighbors for each query vector.

    Returns ``(query_id, neighbor_id, cosine_sim, rank)``; self-matches are
    excluded. ``queries`` is broadcast — it must be the small side.
    ``round_digits`` rounds the similarity for cross-engine reproducibility
    (ordering still uses the rounded value + id tiebreak => deterministic).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        l2_norm(vec_col).alias("__qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        l2_norm(vec_col).alias("__cn"),
    )
    sim = _cosine_from_norms("__qv", "__cv", "__qn", "__cn")
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplane_bucket(vec_col, planes: list[list[float]]):
    """Random-hyperplane LSH bucket id: bit i = sign(v · plane_i). Pure
    expression; ``planes`` are fixed driver-side constants (seeded)."""
    bit_exprs = []
    for i, p in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in p])
        d = F.aggregate(
            F.zip_with(F.col(vec_col), arr, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit_exprs.append(
            F.when(d > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        )
    out = bit_exprs[0]
    for e in bit_exprs[1:]:
        out = out.bitwiseOR(e)
    return out


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only same-hyperplane-bucket pairs.

    Recall < 1.0 by construction (an IVF-style tradeoff); the bucket join is
    an equi-join shuffle on a uniform key, so the corpus is scanned once and
    never cross-joined. Deterministic given ``seed``.
    """
    import random

    rnd = random.Random(seed)
    planes = [[rnd.gauss(0, 1) for _ in range(dim)] for _ in range(num_planes)]
    bucket = lambda df, idc: df.select(  # noqa: E731
        F.col(id_col).alias(idc),
        F.col(vec_col).alias(f"__{idc}_v"),
        l2_norm(vec_col).alias(f"__{idc}_n"),
        hyperplane_bucket(vec_col, planes).alias("__bucket"),
    )
    q = bucket(queries, "query_id")
    c = bucket(corpus, "neighbor_id")
    scored = (
        c.join(q, "__bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _cosine_from_norms(
                    "__query_id_v", "__neighbor_id_v", "__query_id_n", "__neighbor_id_n"
                ),
                6,
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_dup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding-cosine near-dup pairs (id_a < id_b, sim >= threshold).

    O(n²) scoring — the oracle-checkable exact variant for bounded inputs.
    The scale path is ``embedding_dup_pairs_lsh`` (bucketed candidates)."""
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
        l2_norm(vec_col).alias("__na"),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
        l2_norm(vec_col).alias("__nb"),
    )
    sim = F.round(_cosine_from_norms("__va", "__vb", "__na", "__nb"), 6)
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )


def embedding_dup_pairs_lsh(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Embedding near-dup at scale: hyperplane-bucket both sides, score only
    same-bucket pairs (equi-join shuffle on a uniform key, no n² blowup).
    High-threshold pairs almost always share all hyperplane signs, so recall
    at threshold>=0.9 is near-exact while cost drops ~2^planes-fold."""
    import random

    rnd = random.Random(seed)
    planes = [[rnd.gauss(0, 1) for _ in range(dim)] for _ in range(num_planes)]
    bucketed = df.select(
        F.col(id_col),
        F.col(vec_col),
        l2_norm(vec_col).alias("__n"),
        hyperplane_bucket(vec_col, planes).alias("__bucket"),
    )
    a = bucketed.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
        F.col("__n").alias("__na"),
        "__bucket",
    )
    b = bucketed.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
        F.col("__n").alias("__nb"),
        "__bucket",
    )
    sim = F.round(_cosine_from_norms("__va", "__vb", "__na", "__nb"), 6)
    return (
        a.join(b, "__bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )


def embedding_buckets(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """The PERSISTABLE hyperplane-LSH index of an embedding corpus:
    ``(id, bucket)`` rows — the vector-space analogue of the text side's
    ``neardup.minhash_band_buckets``. A production pipeline lands this
    once and APPENDS each increment's rows; the LSH parameters
    (num_planes, dim, seed) are part of the index identity, exactly like
    the MinHash band parameters. One narrow projection, no shuffle."""
    import random

    rnd = random.Random(seed)
    planes = [[rnd.gauss(0, 1) for _ in range(dim)] for _ in range(num_planes)]
    return df.select(
        F.col(id_col), hyperplane_bucket(vec_col, planes).alias("bucket")
    )


def embedding_dup_candidates_from_buckets(
    new_buckets: DataFrame,
    all_buckets: DataFrame,
    vectors: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    strict: bool = False,
) -> DataFrame:
    """Incremental embedding near-dup: equi-join the INCREMENT's bucket
    rows against the full landed index (existing ∪ new, same LSH
    parameters), then score only the candidate pairs with exact cosine —
    old × old pairs were previous runs' output and never recompute, so
    cost tracks the increment's bucket matches (the ``neardup.
    lsh_candidates_from_buckets`` contract in vector space). ``vectors``
    supplies the raw embeddings for the candidate-bounded exact scoring
    (two equi-joins — never a corpus scan per pair). Returns
    ``(id_a, id_b, cosine_sim)`` with id_a < id_b, distinct.

    CONTRACT: every id in ``all_buckets`` must have a row in ``vectors``
    — the scoring joins are INNER, so an id present in the landed index
    but missing from the vector store silently drops its candidate pairs
    (round-5 advisor finding). Pass ``strict=True`` to pay one bounded
    eager check (anti-join of the CANDIDATE ids — never the corpus —
    against ``vectors``, LIMIT 5) that raises ``ValueError`` naming
    sample missing ids when the index and vector store have drifted."""
    a = new_buckets.alias("a")
    b = all_buckets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
        )
        .select(
            F.least(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_a"),
            F.greatest(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_b"),
        )
        .distinct()
    )
    if strict:
        cand_ids = pairs.select(F.col("id_a").alias("__id")).union(
            pairs.select(F.col("id_b").alias("__id"))
        ).distinct()
        missing = (
            cand_ids.join(
                vectors.select(F.col(id_col).alias("__id")), "__id", "left_anti"
            )
            .limit(5)
            .collect()
        )
        if missing:
            raise ValueError(
                "bucket index / vector store drift: candidate ids missing "
                f"from `vectors` (sample): {sorted(r['__id'] for r in missing)}"
            )
    va = vectors.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
        l2_norm(vec_col).alias("__na"),
    )
    vb = vectors.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
        l2_norm(vec_col).alias("__nb"),
    )
    sim = F.round(_cosine_from_norms("__va", "__vb", "__na", "__nb"), 6)
    return (
        pairs.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", sim.alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_lists: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k cosine — the coarse-quantizer
    scale path next to the hyperplane-LSH tier.

    Index build: ``n_lists`` deterministic coarse centroids (smallest-id
    vectors — reuses ``clustering.init_centroids_by_id``) enter the plan as
    broadcast literals; every corpus vector is assigned to its nearest list
    by the same integer-micro argmin as k-means assignment (one codegen'd
    projection fused into the scan, no shuffle).

    Probe: each query scores the same ``n_lists`` literal centroids and
    keeps its ``n_probe`` nearest lists; candidates are fetched with an
    equi-join on the list id — the shuffle carries only list-id keys, the
    corpus is scanned once and never cross-joined. Exact cosine + window
    top-k within the probed lists. Recall < 1 by construction (vectors in
    unprobed lists are invisible), the standard IVF trade; the exact twin
    ``cosine_topk`` is the oracle baseline.

    Deterministic end-to-end: centroids are id-ordered, distances integer,
    list assignment argmin has an id tiebreak — so the DuckDB oracle can
    replay the identical index + probe in SQL.
    """
    from unified_firmographic_data_pipeline_spark.operators.clustering import (
        assign_clusters,
        init_centroids_by_id,
        probe_lists_expr,
    )

    centroids = init_centroids_by_id(corpus, n_lists, vec_col, id_col)
    c = (
        assign_clusters(corpus, centroids, vec_col)
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("__cv"),
            l2_norm(vec_col).alias("__cn"),
            F.col("cluster_id").alias("__list"),
        )
    )
    # per-query probe list: the shared IVF selector (expression-identical
    # to the inline form it replaced — argsort of (distance, id) structs)
    probes = probe_lists_expr(centroids, n_probe, vec_col)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        l2_norm(vec_col).alias("__qn"),
        F.explode(probes).alias("__list"),
    )
    scored = (
        # broadcast the bounded query side: a plain equi-join on at most
        # n_lists distinct keys would shuffle the whole corpus into
        # n_lists reducers
        c.join(F.broadcast(q), "__list")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_cosine_from_norms("__qv", "__cv", "__qn", "__cn"), 6).alias(
                "cosine_sim"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def cosine_topk_numpy(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = 100_000,
) -> DataFrame:
    """Brute-force cosine top-k on the designated Python tier: Arrow-batched
    ``mapInPandas`` with one numpy matmul per batch instead of a per-pair
    fold expression.

    The (bounded) query set ships to executors as a normalized matrix; each
    corpus batch computes ``C_norm @ Q_norm.T`` and emits only its local
    top-k per query, so the shuffle into the global top-k window carries
    O(batches x queries x k) rows — never the full similarity matrix.
    ~an order of magnitude faster than the expression fold at wide batch
    sizes, at the cost of leaving whole-stage codegen; the expression twin
    (cosine_topk) stays the oracle-checked reference.

    The query set is collected to the driver by design (it is the small
    side of the broadcast); ``max_queries`` makes that contract enforceable
    — a query frame larger than the cap raises instead of silently pulling
    an unbounded result to the driver. Raise the cap explicitly if a larger
    (still memory-bounded) query set is intended.
    """
    import numpy as np
    import pandas as pd

    # cheap bounded probe: scans at most max_queries+1 rows of the id column
    probe = queries.select(id_col).limit(max_queries + 1).count()
    if probe > max_queries:
        raise ValueError(
            f"cosine_topk_numpy: query set exceeds max_queries={max_queries}; "
            "this tier collects the query side to the driver — use the "
            "expression tier (cosine_topk) or LSH tier (cosine_topk_lsh) for "
            "large query sets, or raise max_queries explicitly"
        )
    q_rows = queries.select(id_col, vec_col).collect()
    qids = np.array([r[id_col] for r in q_rows], dtype=np.int64)
    Q = np.array([list(r[vec_col]) for r in q_rows], dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
            sims = Cn @ Qn.T  # (batch, n_queries)
            top = min(k + 1, len(ids))  # +1: a query may match itself
            idx = np.argpartition(-sims, top - 1, axis=0)[:top]
            out = {
                "query_id": np.repeat(qids, top),
                "neighbor_id": ids[idx].T.ravel(),
                "cosine_sim": np.take_along_axis(sims, idx, axis=0).T.ravel(),
            }
            yield pd.DataFrame(out)

    local = corpus.select(id_col, vec_col).mapInPandas(
        score, schema="query_id long, neighbor_id long, cosine_sim double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        local.filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", F.round("cosine_sim", 6).alias("cosine_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _mmr_schema(query_col: str, doc_col: str, rel_col: str) -> str:
    """Output schema for mmr_rerank, built from the caller's column names so
    non-default names round-trip (the pandas frame below uses the same
    names)."""
    return (
        f"{query_col} long, {doc_col} long, rank int, "
        f"{rel_col} double, mmr_score double"
    )


# default-name schema kept as a public constant for callers/tests
MMR_SCHEMA = _mmr_schema("query_id", "doc_id", "relevance")


def mmr_rerank(
    candidates: DataFrame,
    k: int = 10,
    lambda_mult: float = 0.7,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    vec_col: str = "embedding",
    rel_col: str = "relevance",
    fold_exact: bool = False,
) -> DataFrame:
    """Maximal Marginal Relevance rerank of per-query candidate sets:
    greedily pick argmax of ``lambda*relevance - (1-lambda)*max_sim_to_
    already_picked`` (Carbonell & Goldstein, SIGIR'98) — the standard
    diversity pass after ANN retrieval collapses near-duplicate hits.

    The greedy loop is inherently sequential *per query* but embarrassingly
    parallel *across queries*, so it runs as ``applyInPandas`` over the
    query_id grouping: one shuffle on query_id, candidate sets (ANN top-N,
    bounded) fit each group in memory, numpy does the pairwise cosines.
    Ties break on doc_id; scores round to 6 decimals so the selection is
    reproducible across BLAS builds.

    ``fold_exact=True`` makes the arithmetic SQL-engine-replayable, two
    substitutions: pairwise cosines use a sequential left-to-right fold
    (plain accumulation, unit vectors NOT pre-divided) instead of BLAS —
    the exact arithmetic ``list_dot_product`` / Spark's ``F.aggregate``
    performs — and every 6-decimal round uses HALF-AWAY-FROM-ZERO
    (DuckDB ``round`` / Spark ``F.round`` semantics) instead of numpy's
    half-even. The second one is NOT a measure-zero concern: relevance
    arrives pre-rounded to 6 decimals, so ``0.7*rel`` lands exactly on a
    .5e-7 boundary whenever rel's last digit is odd, and the two
    rounding modes then disagree systematically. Cost is k·n Python dot
    products per query — fine for oracle-scale candidate sets (n ≤
    ~100); the default BLAS path is the production tier (pytest pins the
    two paths pick-identical on test data).
    """
    import numpy as np
    import pandas as pd

    lam = float(lambda_mult)

    def _round6_half_away(arr):
        # DuckDB round(x, 6): std::round(x * 10^6) / 10^6, half away from 0
        t = arr * 1000000.0
        return np.trunc(t + np.copysign(0.5, t)) / 1000000.0

    def _rerank(pdf: pd.DataFrame) -> pd.DataFrame:
        vecs = np.array(pdf[vec_col].tolist(), dtype=np.float64)
        if fold_exact:
            rows = [[float(x) for x in v] for v in vecs]

            def _dot(a, b):
                s = 0.0
                for x, y in zip(a, b):
                    s += x * y
                return s

            norms = np.array([math.sqrt(_dot(r, r)) for r in rows])
        else:
            norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0.0] = 1.0
        unit = vecs / norms[:, None]
        rel = pdf[rel_col].to_numpy(dtype=np.float64)
        docs = pdf[doc_col].to_numpy()
        qid = pdf[query_col].iloc[0]
        n = len(pdf)
        rnd6 = _round6_half_away if fold_exact else (lambda a: np.round(a, 6))
        picked: list[int] = []
        max_sim = np.zeros(n)
        out = []
        for rank in range(min(k, n)):
            score = rnd6(lam * rel - (1.0 - lam) * max_sim)
            if picked:
                score[picked] = -np.inf
            best_score = score.max()
            cand = np.nonzero(score == best_score)[0]
            best = cand[np.argmin(docs[cand])]  # doc_id tiebreak
            picked.append(int(best))
            out.append((qid, docs[best], rank + 1, rel[best], float(best_score)))
            if fold_exact:
                sims = rnd6(np.array([
                    _dot(r, rows[best]) / (norms[i] * norms[best])
                    for i, r in enumerate(rows)
                ]))
            else:
                sims = np.round(unit @ unit[best], 6)
            # max_sim starts at zeros, so the diversity penalty is FLOORED
            # at 0 — a picked neighbor pointing the other way (negative
            # cosine) never *rewards* a candidate. Oracles must replay
            # this floor (GREATEST(max_sim, 0)).
            max_sim = np.maximum(max_sim, sims)
        return pd.DataFrame(
            out, columns=[query_col, doc_col, "rank", rel_col, "mmr_score"]
        )

    return candidates.groupBy(query_col).applyInPandas(
        _rerank, _mmr_schema(query_col, doc_col, rel_col)
    )


def recall_at_k(
    approx: DataFrame, exact: DataFrame, k: int
) -> DataFrame:
    """Evaluate an ANN tier against exact ground truth: per-query
    ``recall@k`` = |approx top-k ∩ exact top-k| / |exact top-k|.

    Both inputs are the shared tier contract ``(query_id, neighbor_id,
    rank, ...)`` (any extra columns ignored) — so every tier in the ladder
    (LSH/IVF/PQ/SQ/BQ/RP, and the materialized index) is measurable against
    ``cosine_topk`` with one call. The denominator is the EXACT list's size
    (≤ k: a query can have fewer than k real neighbors), so a perfect tier
    scores 1.0 even at corpus edges. Queries absent from ``approx`` score
    0.0 — silent misses must hurt, not vanish.

    Scale shape: both sides are already top-k-bounded (rows ≤ queries × k),
    one equi-join on (query_id, neighbor_id) + one groupBy — eval cost is
    query-proportional, never corpus-proportional.

    Returns ``(query_id, n_exact, n_hit, recall)``.
    """
    ex = exact.filter(F.col("rank") <= k).select("query_id", "neighbor_id")
    ap = approx.filter(F.col("rank") <= k).select(
        "query_id", "neighbor_id", F.lit(1).alias("__hit")
    )
    joined = ex.join(ap, ["query_id", "neighbor_id"], "left")
    return joined.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.count("__hit").alias("n_hit"),
        (F.count("__hit") / F.count(F.lit(1))).alias("recall"),
    )



def contrastive_triplets(
    corpus: DataFrame,
    queries: DataFrame,
    k_neg: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive/embedding training data: for
    each anchor (query vector) return its hardest POSITIVE — the most
    cosine-similar corpus vector sharing the anchor's label — paired with
    the ``k_neg`` hardest NEGATIVES (most similar vectors with a DIFFERENT
    label), plus the triplet margin ``pos_sim - neg_sim``. Small or
    negative margins mark the triplets that actually teach a metric model
    something (semi-hard mining, FaceNet Schroff et al. CVPR'15 /
    SimCSE-style in-batch hard negatives).

    Plan shape (the ``cosine_topk`` contract): the bounded anchor set
    broadcasts, the corpus is scanned ONCE, and one shuffle on
    ``(query_id, same_label)`` ranks positives and negatives in the same
    window pass — never a per-anchor corpus scan. Output is
    anchor-proportional (≤ queries × k_neg rows).

    Anchors with no same-label neighbor in the corpus drop out (inner
    join by design — there is no triplet to emit); self-matches are
    excluded. Similarities round to 6 decimals (cross-engine contract),
    and the margin is the exact difference of the rounded sims.

    Returns ``(query_id, pos_id, pos_sim, neg_id, neg_sim, margin,
    neg_rank)``.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(label_col).alias("__ql"),
        F.col(vec_col).alias("__qv"),
        l2_norm(vec_col).alias("__qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("__cl"),
        F.col(vec_col).alias("__cv"),
        l2_norm(vec_col).alias("__cn"),
    )
    scored = c.join(
        F.broadcast(q), F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "neighbor_id",
        (F.col("__ql") == F.col("__cl")).alias("__same"),
        F.round(_cosine_from_norms("__qv", "__cv", "__qn", "__cn"), 6).alias(
            "sim"
        ),
    )
    w = Window.partitionBy("query_id", "__same").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    ranked = scored.withColumn("rn", F.row_number().over(w))
    pos = ranked.filter(F.col("__same") & (F.col("rn") == 1)).select(
        "query_id",
        F.col("neighbor_id").alias("pos_id"),
        F.col("sim").alias("pos_sim"),
    )
    neg = ranked.filter(~F.col("__same") & (F.col("rn") <= k_neg)).select(
        "query_id",
        F.col("neighbor_id").alias("neg_id"),
        F.col("sim").alias("neg_sim"),
        F.col("rn").alias("neg_rank"),
    )
    # pos is 1 row per anchor (anchors are bounded by contract) — broadcast
    # it so the pos x neg pairing never sort-merges the window output
    return neg.join(F.broadcast(pos), "query_id").select(
        "query_id",
        "pos_id",
        "pos_sim",
        "neg_id",
        "neg_sim",
        (F.col("pos_sim") - F.col("neg_sim")).alias("margin"),
        "neg_rank",
    )


def mutual_nearest_pairs(
    corpus: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_kwargs: dict | None = None,
) -> DataFrame:
    """Reciprocal (mutual) nearest-neighbor pairs: ``(id_a, id_b)`` where
    b is in a's top-k cosine neighbors AND a is in b's — the standard
    high-precision gate on top of raw similarity (used for translation
    pair mining à la CCMatrix/LASER margin filtering, and as a stricter
    dedup candidate filter: one-directional neighbors are often hub
    artifacts; mutual ones are almost always true matches).

    Plan shape: the top-k lists come from the hyperplane-LSH tier
    (``cosine_topk_lsh`` — bucket equi-join, corpus never cross-joined),
    then reciprocity is a self-join of the (query, neighbor) list on the
    REVERSED key pair — top-k-bounded rows on both sides, one shuffle.
    Canonical output: id_a < id_b, both directions' sims agree by
    symmetry (the pair carries one ``cosine_sim``), distinct.

    ``bucket_kwargs`` forwards (num_planes, dim, seed) to the LSH tier so
    the candidate recall/precision point is the caller's choice; the
    reciprocity gate itself is exact given the lists.
    """
    kw = bucket_kwargs or {}
    topk = cosine_topk_lsh(corpus, corpus, k=k, id_col=id_col, vec_col=vec_col, **kw)
    fwd = topk.select("query_id", "neighbor_id", "cosine_sim")
    rev = topk.select(
        F.col("neighbor_id").alias("query_id"),
        F.col("query_id").alias("neighbor_id"),
    )
    mutual = fwd.join(rev, ["query_id", "neighbor_id"])
    return (
        mutual.select(
            F.least("query_id", "neighbor_id").alias("id_a"),
            F.greatest("query_id", "neighbor_id").alias("id_b"),
            "cosine_sim",
        )
        .distinct()
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k_rrf: int = 60,
    query_col: str = "query_id",
    id_col: str = "neighbor_id",
    rank_col: str = "rank",
    topk: int | None = None,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack, Clarke & Büttcher SIGIR'09) —
    the standard score-free way to combine heterogeneous retrievers
    (dense cosine + lexical BM25-ish + inner-product, ...):
    ``RRF(d) = Σ_r 1/(k + rank_r(d))`` with the canonical ``k = 60``.
    Rank-based, so it needs no score normalization across retrievers —
    which is exactly why it wins in hybrid-search serving stacks.

    Inputs are per-query ranked candidate lists ``(query_col, id_col,
    rank_col)`` with 1-based ranks (the shape every top-k operator in
    this module emits). A document missing from a ranker's list simply
    contributes no term for that ranker — the usual RRF convention.
    Duplicate ``(query, id)`` rows WITHIN one ranker (a contract
    violation upstream) collapse to that ranker's best rank instead of
    silently inflating the score and ``n_rankers`` (round-9 advisory):
    each input is tagged with its ranker index and pre-aggregated to
    ``min(rank)`` per ``(query, id, ranker)``, so ``n_rankers`` is
    literally the number of rankers that listed the document.

    Output: ``(query_col, id_col, rrf_score_nano, n_rankers,
    fused_rank)``. The score is integer-exact for cross-engine
    verification: each term quantizes to ``round(1e9/(k+rank))`` NANO
    units BEFORE the sum (both engines round the identical double — the
    sum is then order-free BIGINT arithmetic, immune to float
    re-association), and the fused ranking totally orders on
    ``(rrf_score_nano DESC, id ASC)``.

    Scale shape: each input list is already bounded per query (top-k by
    contract); fusion is one unionByName + one (query, id) hash
    aggregate + one per-query window over ≤ Σk_r candidate rows per
    query — no join against the corpus, no cross product. At 100 TB the
    cost lives in the upstream retrievers, not here."""
    from functools import reduce

    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    parts = [
        r.select(query_col, id_col, rank_col, F.lit(i).alias("__ranker"))
        for i, r in enumerate(rankings)
    ]
    u = reduce(lambda a, b: a.unionByName(b), parts)
    # collapse within-ranker duplicates to the best rank; map-side
    # combinable, and the rows are top-k lists — negligible next to the
    # retrievers that produced them
    best = u.groupBy(query_col, id_col, "__ranker").agg(
        F.min(rank_col).alias(rank_col)
    )
    term = F.round(F.lit(1e9) / (F.lit(k_rrf) + F.col(rank_col))).cast("long")
    fused = (
        best.select(query_col, id_col, term.alias("__t"))
        .groupBy(query_col, id_col)
        .agg(
            F.sum("__t").alias("rrf_score_nano"),
            F.count(F.lit(1)).cast("long").alias("n_rankers"),
        )
    )
    w = Window.partitionBy(query_col).orderBy(
        F.col("rrf_score_nano").desc(), F.col(id_col).asc()
    )
    out = fused.withColumn("fused_rank", F.row_number().over(w))
    if topk is not None:
        out = out.filter(F.col("fused_rank") <= topk)
    return out

"""Binary quantization (BQ) — the 1-bit ANN compression tier.

The coarsest rung of the vector-compression ladder (float → SQ8
(``operators/sq.py``) → PQ (``operators/pq.py``) → BQ): each component
collapses to one bit (above/below a per-dimension threshold), a d-dim
vector becomes d bits, and distance is Hamming — ``bit_count(a XOR b)``,
one native integer instruction per 32-bit word. For the 64-dim
embeddings here that is 64x smaller than float64 and the cheapest
possible per-pair scan; modern vector stores use exactly this shape as
the first-pass filter with an exact re-rank behind it, which is also
how ``bq_topk`` is built (shortlist by Hamming, re-rank by exact
cosine via ``similarity.exact_cosine_rerank``).

Representation: signatures are ``array<long>`` of ceil(d/32) words,
each word Horner-packing 32 bits (acc*2 + bit). 32 bits per word on
purpose: a 64-bit Horner pack would overflow the signed long on the
top bit — and Spark 4's ANSI mode turns that overflow into a runtime
error, not a wrap.

Scale shape: training is one avg() pass (d bounded scalars);
encoding is a zip_with/aggregate projection fused into the scan, no
shuffle; search broadcasts the (bounded) query signatures onto the
signature scan — the corpus side never touches floats until the
shortlist re-rank. NULL-strict like the other tiers: malformed
vectors yield NULL signature words -> NULL Hamming distances, ranked
last (``asc_nulls_last``), never fabricated matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: per-dimension bit thresholds
Thresholds = list[float]

_WORD = 32  # bits packed per signature word (see module docstring)


def bq_train(
    corpus: DataFrame, vec_col: str = "embedding", dim: int = 64
) -> Thresholds:
    """Per-dimension mean threshold — one aggregate pass. (For
    L2-normalized, roughly zero-centered data a constant 0.0 works too;
    the mean keeps the bit split balanced for any distribution.)"""
    aggs = [
        F.avg(F.try_element_at(F.col(vec_col), F.lit(i + 1)).cast("double")).alias(
            f"t{i}"
        )
        for i in range(dim)
    ]
    row = corpus.agg(*aggs).collect()[0]
    if any(row[f"t{i}"] is None for i in range(dim)):
        raise ValueError(
            f"bq_train: corpus is empty or some dimension < {dim} has no "
            "non-NULL values"
        )
    return [float(row[f"t{i}"]) for i in range(dim)]


def _sig_col(thresholds: Thresholds, vec_col: str):
    """array<long> signature: ceil(d/32) words, word w Horner-packing
    bits for dimensions [w*32, w*32+31] (bit for the LOWEST dimension in
    the word ends up most significant — a fixed, documented convention;
    only XOR symmetry matters for Hamming). NULL-strict: a NULL
    component nulls its word (acc*2 + NULL = NULL propagates through
    the fold), so malformed vectors cannot alias a real signature."""
    dim = len(thresholds)
    words = []
    for w in range(0, dim, _WORD):
        ts = thresholds[w : w + _WORD]
        t_lit = F.array(*[F.lit(float(t)) for t in ts])
        bits = F.zip_with(
            F.slice(F.col(vec_col), w + 1, len(ts)),
            t_lit,
            lambda x, t: F.when(x.isNull(), F.lit(None).cast("long")).otherwise(
                (x.cast("double") > t).cast("long")
            ),
        )
        # wrong-length vectors: slice yields a SHORT array and zip_with
        # pads with NULL -> the word goes NULL, same as a NULL component
        words.append(
            F.aggregate(bits, F.lit(0).cast("long"), lambda acc, b: acc * 2 + b)
        )
    return F.array(*words)


def bq_encode(
    corpus: DataFrame,
    thresholds: Thresholds,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, sig) — one projection, no shuffle. ``sig`` is ~d/8 bytes of
    state per vector, the cheapest scan representation this repo has."""
    return corpus.select(F.col(id_col), _sig_col(thresholds, vec_col).alias("sig"))


def hamming_dist(a, b):
    """Hamming distance between two signature columns: per-word
    ``bit_count(XOR)`` summed — integer-only, order-independent."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0).cast("long"),
        lambda acc, s: acc + s,
    )


def bq_topk(
    sigs: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    thresholds: Thresholds,
    k: int = 10,
    shortlist: int = 100,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """The deployed BQ shape: Hamming shortlists ``shortlist`` candidates
    per query from the bit signatures (the first-pass 100 TB scan — no
    float math, no full-vector reads), then only the shortlist joins
    back to raw vectors for the exact cosine re-rank. 1 bit per
    component is coarse, so the shortlist must be wider than PQ/SQ's
    (default 100 vs 50); the recall floor is pinned in tests. Output
    ``(query_id, neighbor_id, cosine_sim, rank)``."""
    from unified_firmographic_data_pipeline_spark.operators.similarity import (
        exact_cosine_rerank,
    )

    q = queries.select(
        F.col(id_col).alias("query_id"), _sig_col(thresholds, vec_col).alias("__qs")
    )
    c = sigs.select(F.col(id_col).alias("neighbor_id"), "sig")
    scored = c.join(
        F.broadcast(q), F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "neighbor_id",
        hamming_dist(F.col("__qs"), F.col("sig")).alias("hamming_dist"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("hamming_dist").asc_nulls_last(), F.col("neighbor_id").asc()
    )
    cand = scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= shortlist
    )
    return exact_cosine_rerank(cand, corpus, queries, k, vec_col, id_col)

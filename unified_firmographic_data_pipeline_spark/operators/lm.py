"""N-gram language-model surprisal scoring — the CCNet/KenLM-style
quality gate: score each document by its cross-entropy under a reference
n-gram model; implausible token sequences (boilerplate soup, lorem-ipsum,
SEO keyword stuffing, OCR wreckage) score high-surprisal even when they
pass the cheap length/stopword heuristics in ``functions/scoring.py``.

Public method (Wenzek et al., "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data", LREC 2020 — a KenLM 5-gram model's
perplexity buckets web documents into head/middle/tail): this module
implements the same decision with an add-k-smoothed bigram model trained
inside the engine, so the whole loop (train counts -> score -> bucket) is
Spark-native and SQL-replayable:

- :func:`bigram_counts` / :func:`unigram_counts`: one explode over a
  SLICED-array zip (bigrams come from ``arrays_zip(t[0:n-1], t[1:n-1])``
  — expression-only, no position self-join) and a map-side-combinable
  groupBy. Model size is vocab-shaped, not corpus-shaped; a
  ``min_count`` prune keeps the scoring join's build side broadcastable.
- :func:`doc_surprisal`: each scored document's bigrams LEFT-join the
  model (absent bigram/unigram counts coalesce to 0 — add-k handles
  unseen mass), per-bigram log2 probability
  ``log2((c12 + k) / (c1 + k * V))`` is quantized to integer micro-units
  at the row level (the repo's cross-engine-exact device,
  ``driver_queries._dsum``), so the per-document SUM is integer-exact
  and the final mean is one deterministic division on both engines.

Scale shape: training is one shuffle on the bigram key; scoring is one
equi-join against the (pruned, usually broadcast) model plus one
doc-keyed aggregation. Nothing is corpus-quadratic; the vocabulary-size
scalar V is a 1-row aggregate. At 100 TB you train on a sampled slice
(the model converges long before the corpus ends) and score everything —
exactly the CCNet deployment shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from unified_firmographic_data_pipeline_spark.functions.text import tokens


def _bigram_rows(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) — one row per in-document bigram, expression-only.

    ``F.split`` never returns an empty array (``tokens('') == ['']``), so
    docs with fewer than two real tokens simply produce an empty slice
    and drop out at the explode; no special-casing."""
    t = tokens(text_col)
    n = F.size(t)
    pairs = F.arrays_zip(
        F.slice(t, 1, F.greatest(n - 1, F.lit(0))).alias("w1"),
        F.slice(t, 2, F.greatest(n - 1, F.lit(0))).alias("w2"),
    )
    return df.select(F.col(id_col), F.explode(pairs).alias("bg")).select(
        id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    )


def bigram_counts(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """Corpus bigram table ``(w1, w2, c12)``; ``min_count`` prunes the
    long tail so the scoring join's build side stays broadcastable."""
    out = (
        _bigram_rows(df, id_col, text_col)
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("c12"))
    )
    if min_count > 1:
        out = out.filter(F.col("c12") >= min_count)
    return out


def unigram_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus LEFT-context unigram table ``(w1, c1)`` — counts of tokens
    in bigram-head position (= all but each doc's last token), which is
    the correct add-k denominator: ``Σ_w2 c12(w1, w2) = c1(w1)``."""
    return (
        _bigram_rows(df, id_col, text_col)
        .groupBy("w1")
        .agg(F.count("*").cast("long").alias("c1"))
    )


def doc_surprisal(
    score_docs: DataFrame,
    train_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: float = 0.5,
    min_count: int = 1,
    broadcast_model: bool = True,
) -> DataFrame:
    """Per-document bigram cross-entropy under the train-corpus model:
    ``(id, n_bigrams, sum_logp_micro, avg_logp, ppl_proxy)`` where
    ``avg_logp`` is the mean add-k log2 probability and ``ppl_proxy`` is
    ``2 ** -avg_logp``. Bigrams/contexts unseen in training coalesce to
    count 0 — add-k assigns them the uniform floor ``k / (c1 + k V)``.

    Every per-bigram log-probability is rounded to integer micro-units
    BEFORE summing (floats re-associate across engines; integers don't),
    making the document score bit-replayable by a SQL oracle. Docs with
    fewer than two tokens have no bigrams and drop out (no NULL rows).
    """
    model_bi = bigram_counts(train_docs, id_col, text_col, min_count=min_count)
    model_uni = unigram_counts(train_docs, id_col, text_col)
    v = model_uni.agg(F.count("*").cast("long").alias("__v"))

    bg = _bigram_rows(score_docs, id_col, text_col)
    joined = (
        bg.join(
            F.broadcast(model_bi) if broadcast_model else model_bi,
            ["w1", "w2"],
            "left",
        )
        .join(
            F.broadcast(model_uni) if broadcast_model else model_uni,
            ["w1"],
            "left",
        )
        .crossJoin(F.broadcast(v))
    )
    logp: Column = F.log2(
        (F.coalesce(F.col("c12"), F.lit(0)).cast("double") + F.lit(float(k)))
        / (
            F.coalesce(F.col("c1"), F.lit(0)).cast("double")
            + F.lit(float(k)) * F.col("__v").cast("double")
        )
    )
    per = joined.select(
        id_col, F.round(logp * 1e6).cast("long").alias("__lp_micro")
    )
    agg = per.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.sum("__lp_micro").cast("long").alias("sum_logp_micro"),
    )
    avg = (
        F.col("sum_logp_micro").cast("double")
        / F.col("n_bigrams").cast("double")
        / F.lit(1e6)
    )
    return agg.select(
        id_col,
        "n_bigrams",
        "sum_logp_micro",
        F.round(avg, 6).alias("avg_logp"),
        F.round(F.pow(F.lit(2.0), -avg), 6).alias("ppl_proxy"),
    )


def skipgram_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 2,
    min_count: int = 1,
) -> DataFrame:
    """Skip-gram (center, context) training pairs with corpus counts —
    the word2vec data-generation step (Mikolov et al. 2013): every token
    pairs with its neighbors at distance 1..window, both directions.

    Expression-only: per offset, the (center, context) stream is one
    ``arrays_zip`` of two shifted slices of the token array (the bigram
    device generalized), all offsets concatenated and exploded in a
    single pass — pair volume is ``2 * window * corpus_tokens``, linear
    in the corpus, and the only shuffle is the (w, c) count. Mikolov's
    frequent-word subsampling is a policy knob upstream (drop tokens by
    a deterministic hash threshold before calling) — not baked in here.
    Returns ``(w, c, n)`` with ``n >= min_count``."""
    t = tokens(text_col)
    n = F.size(t)
    arrays = []
    for off in range(1, window + 1):
        ln = F.greatest(n - off, F.lit(0))
        a = F.slice(t, 1, ln)
        b = F.slice(t, 1 + off, ln)
        arrays.append(F.arrays_zip(a.alias("w"), b.alias("c")))
        arrays.append(F.arrays_zip(b.alias("w"), a.alias("c")))
    pairs = df.select(F.explode(F.concat(*arrays)).alias("p")).select(
        F.col("p.w").alias("w"), F.col("p.c").alias("c")
    )
    out = pairs.groupBy("w", "c").agg(F.count("*").cast("long").alias("n"))
    if min_count > 1:
        out = out.filter(F.col("n") >= min_count)
    return out


def mlm_masking_plan(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    select_p: float = 0.15,
    mask_p: float = 0.8,
    random_p: float = 0.1,
    mask_token: str = "[MASK]",
) -> DataFrame:
    """BERT-style masked-LM corpus plan (Devlin et al. 2019 §3.1): select
    ``select_p`` of token positions; of those, ``mask_p`` become
    ``mask_token``, ``random_p`` a random vocabulary token, the rest kept
    — emitted as (id, pos, token, action, replacement) rows a training
    loader consumes.

    Every draw is a hash-uniform over (salt, id, pos)
    (operators/sampling.py:hash_uniform — the 13-hex md5 mantissa), so
    the masking plan is engine-replayable and IDENTICAL on any cluster
    size or rerun — rerunning corpus prep cannot silently change what the
    model sees (the reproducibility property df.sample lacks). The random
    replacement draws from the input corpus' own distinct-token
    vocabulary via index = floor(u * |V|), clamped, over a vocab-bounded
    row_number — vocab table broadcasts to the join.

    Narrow per-token pipeline: tokenize-explode, three hash columns, one
    broadcast vocab join; no shuffle touches the token stream itself.
    """
    from pyspark.sql.window import Window

    from unified_firmographic_data_pipeline_spark.operators.sampling import (
        hash_uniform,
    )

    toks = docs.select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("pos", "token")
    )

    def key(salt: str) -> F.Column:
        return F.concat(
            F.lit(salt),
            F.col(id_col).cast("string"),
            F.lit(":"),
            F.col("pos").cast("string"),
        )

    vocab = (
        toks.select("token").distinct()
        .select(
            F.row_number().over(Window.orderBy("token")).alias("vid"),
            F.col("token").alias("rand_token"),
        )
    )
    n_vocab = vocab.agg(F.count("*").alias("nv"))
    sel = (
        toks.filter(hash_uniform(key("mlm")) < select_p)
        .withColumn("u_act", hash_uniform(key("act")))
        .withColumn("u_tok", hash_uniform(key("tok")))
        .crossJoin(F.broadcast(n_vocab))
        .withColumn(
            "action",
            F.when(F.col("u_act") < mask_p, "mask")
            .when(F.col("u_act") < mask_p + random_p, "random")
            .otherwise("keep"),
        )
        .withColumn(
            "vid",
            (
                F.least(
                    F.floor(F.col("u_tok") * F.col("nv")), F.col("nv") - 1
                )
                + 1
            ).cast("int"),
        )
    )
    return (
        sel.join(F.broadcast(vocab), "vid")
        .select(
            id_col,
            "pos",
            "token",
            "action",
            F.when(F.col("action") == "mask", mask_token)
            .when(F.col("action") == "random", F.col("rand_token"))
            .otherwise(F.col("token"))
            .alias("replacement"),
        )
    )

"""Corpus-level statistical diagnostics for training-data pipelines:
n-gram novelty decay and exact per-source dataset-card percentiles.
(Zipf rank-frequency and Heaps vocabulary growth live in
``plans/driver_queries.py`` as ``zipf_slope_tokens`` /
``heaps_law_vocab_growth`` since round 3.)

These are "what is in this corpus" numbers a pretraining run reads
before picking a mix (novelty/memorization curves: Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better"). Both are
engineered for bit-exact cross-engine replay: counts stay BIGINT
end-to-end, and percentiles are explicit rank selections (no
engine-specific interpolation rule).

Scale shapes (100 TB contract):
- novelty: distinct (doc, gram) projection (one shuffle on the gram
  key for min-doc, one on doc for the bucket rollup) — never gram x gram.
- card stats: per-source aggregate + two rank-window passes over
  per-doc rows; output is sources x 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from unified_firmographic_data_pipeline_spark.functions.text import shingles, tokens


def ngram_novelty_decay(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    n_buckets: int = 10,
) -> DataFrame:
    """Novelty decay curve (the dedup-motivating diagnostic from Lee et
    al. 2022): per ingestion-order bucket, the fraction of distinct
    (doc, n-gram) pairs whose gram was NEVER seen in an earlier document
    — ``(bucket, n_doc_grams, n_novel, novelty_rate)``. A corpus full of
    templates decays fast; fresh data holds near 1.0.

    Scale shape: the distinct (doc, gram) projection shuffles once on
    the gram key (min-doc per gram rides the same aggregate via a window
    — no second scan), then once on the doc bucket for the rollup. Raw
    text never crosses a shuffle — only md5 gram fingerprints."""
    dg = (
        docs.select(F.col(id_col), F.explode(shingles(text_col, n)).alias("g"))
        .select(id_col, F.md5("g").alias("gf"))
        .distinct()
    )
    w = Window.partitionBy("gf")
    marked = dg.select(
        F.col(id_col),
        (F.col(id_col) == F.min(id_col).over(w)).alias("is_novel"),
    )
    mx = docs.agg((F.max(id_col) + 1).alias("mx"))
    per_bucket = (
        marked.crossJoin(mx)
        .select(
            F.expr(f"({id_col} * {n_buckets}) div mx").cast("int").alias("bucket"),
            "is_novel",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_doc_grams"),
            F.count(F.when(F.col("is_novel"), 1)).alias("n_novel"),
        )
    )
    return per_bucket.select(
        "bucket",
        F.col("n_doc_grams").cast("long").alias("n_doc_grams"),
        F.col("n_novel").cast("long").alias("n_novel"),
        F.round(
            F.col("n_novel").cast("double") / F.col("n_doc_grams").cast("double"), 6
        ).alias("novelty_rate"),
    )


def dataset_card_stats(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source dataset-card summary: doc count, total tokens, total
    chars, and EXACT discrete token-count percentiles (p50/p90 as the
    smallest value whose cumulative rank reaches ceil(p·n) — spelled out
    as a rank window on BOTH engines, because percentile_disc /
    quantile_disc boundary conventions differ between engines).

    Scale shape: one narrow per-doc projection, a per-source aggregate,
    and a rank window partitioned by source — output is |sources| rows."""
    per_doc = docs.select(
        F.col(source_col).alias("source"),
        F.size(tokens(text_col)).cast("long").alias("n_toks"),
        F.length(text_col).cast("long").alias("n_chars"),
    )
    w = Window.partitionBy("source").orderBy("n_toks")
    ranked = per_doc.select(
        "source",
        "n_toks",
        "n_chars",
        F.row_number().over(w).alias("rk"),
        F.count("*").over(Window.partitionBy("source")).alias("n"),
    )
    agg = ranked.groupBy("source").agg(
        F.max("n").alias("n_docs"),
        F.sum("n_toks").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        F.min(
            F.when(F.col("rk") >= F.ceil(F.col("n") * 0.5), F.col("n_toks"))
        ).alias("p50_tokens"),
        F.min(
            F.when(F.col("rk") >= F.ceil(F.col("n") * 0.9), F.col("n_toks"))
        ).alias("p90_tokens"),
    )
    return agg.select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("total_tokens").cast("long").alias("total_tokens"),
        F.col("total_chars").cast("long").alias("total_chars"),
        F.col("p50_tokens").cast("long").alias("p50_tokens"),
        F.col("p90_tokens").cast("long").alias("p90_tokens"),
        F.round(
            F.col("total_tokens").cast("double") / F.col("n_docs").cast("double"), 6
        ).alias("mean_tokens"),
    )

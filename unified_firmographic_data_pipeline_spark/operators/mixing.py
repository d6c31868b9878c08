"""Training-mix planning: temperature-scaled source sampling quotas and
lexicon (blocklist) filter audits.

``temperature_mix_plan`` is the multilingual/multi-source sampling rule
p_i ∝ n_i^alpha (Conneau & Lample 2019, XLM; alpha<1 upsamples small
sources), turned into an EXACT integer token-budget allocation via the
largest-remainder (Hamilton) method — the output is a reproducible plan
a downstream sampler executes, not a float suggestion.

``lexicon_flag_stats`` is the blocklist-rate audit stage of curation
ladders (Rae et al. 2021, Gopher; Penedo et al. 2023, RefinedWeb): how
much of each source a term blocklist would flag — measured BEFORE anyone
decides to filter.

Exactness: weights quantize ``pow(n, alpha)`` to integer micro-units
(the 1e-6 quantum dwarfs the last-ULP pow() disagreement between
engines); quotas, remainders and the +1 distribution are pure BIGINT
arithmetic with total-ordered tie-breaks, so any engine replays the
plan bit-for-bit.

Scale shapes: both operators are one per-doc narrow projection + a
per-source aggregate (|sources| rows); the quota arithmetic runs on the
aggregate only. Nothing here grows past the source axis.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from unified_firmographic_data_pipeline_spark.functions.text import tokens


def temperature_mix_plan(
    docs: DataFrame,
    alpha: float = 0.7,
    budget: int = 1_000_000,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source token quotas under temperature sampling:
    ``(source, n_tokens, weight_micro, quota_tokens)`` with
    ``sum(quota_tokens) == budget`` exactly (largest-remainder rounding;
    remainder ties break on the source name).

    Range bound (round-9 fix): the quota product ``weight_micro *
    budget`` runs in DECIMAL(38,0) — in BIGINT it overflows 2^63 once a
    source passes ~8.7e9 tokens at the default 1M budget, well inside
    the 100 TB contract. DECIMAL(38,0) holds through weight_micro ≈
    2.4e15 (a 2.5e13-token source) times a 1e12-token budget with 10
    digits to spare; ``weight_micro`` itself stays in BIGINT up to
    ~3.6e18 tokens per source. The DuckDB oracle twin widens to HUGEINT
    (INT128) at the same step."""
    per_source = (
        docs.select(
            F.col(source_col).alias("source"),
            F.size(tokens(text_col)).cast("long").alias("nt"),
        )
        .groupBy("source")
        .agg(F.sum("nt").alias("n_tokens"))
    )
    weighted = per_source.select(
        "source",
        "n_tokens",
        F.round(F.pow(F.col("n_tokens").cast("double"), F.lit(alpha)) * 1e6)
        .cast("long")
        .alias("weight_micro"),
    )
    tot = weighted.agg(F.sum("weight_micro").alias("tw"))
    based = weighted.crossJoin(tot).select(
        "source",
        "n_tokens",
        "weight_micro",
        F.expr(
            f"CAST((CAST(weight_micro AS DECIMAL(38,0)) * {budget})"
            " div CAST(tw AS DECIMAL(38,0)) AS BIGINT)"
        ).alias("base"),
        F.expr(
            f"(CAST(weight_micro AS DECIMAL(38,0)) * {budget})"
            " % CAST(tw AS DECIMAL(38,0))"
        ).alias("rem"),
    )
    leftover = based.agg((F.lit(budget) - F.sum("base")).alias("lo"))
    w = Window.orderBy(F.col("rem").desc(), F.col("source").asc())
    return (
        based.crossJoin(leftover)
        .withColumn("rk", F.row_number().over(w))
        .select(
            "source",
            "n_tokens",
            "weight_micro",
            (
                F.col("base")
                + F.when(F.col("rk") <= F.col("lo"), F.lit(1)).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("quota_tokens"),
        )
    )


def epoch_allocation_plan(
    docs: DataFrame,
    alpha: float = 0.7,
    target_epochs: int = 2,
    max_epochs: int = 2,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Data-constrained epoch planner (Muennighoff et al. 2023, "Scaling
    Data-Constrained Language Models"): exact-dedup the corpus first
    (repeating a duplicate is not an epoch), then allocate a token budget
    of ``target_epochs x total unique tokens`` across sources by
    temperature weights (``n^alpha`` — small sources upsample), CAPPED at
    ``max_epochs`` repetitions per source, the diminishing-returns bound.
    Capped spill is REPORTED via ``is_capped`` (per-source base vs final
    quota), not silently redistributed — rebalancing is a policy call the
    plan's reader makes. ``max_epochs`` defaults low enough to bind on
    near-uniform corpora so the cap path stays driver-exercised;
    production planning typically uses ~4 (the paper's knee).

    Output: ``(source, unique_tokens, weight_micro, base_quota,
    quota_tokens, is_capped, epochs_micro)`` — all BIGINT after the
    micro-quantized pow(), so any engine replays the plan bit-for-bit.
    Range bound: budget x weight_micro must stay under 2^63 — holds to
    ~10^7 tokens/source at alpha=0.7 (document before raising scales).

    Scale shape: dedup is one fingerprint-keyed shuffle (the survivors'
    semi-join back keeps the text column off the wire), then one
    per-source aggregate; the allocation arithmetic runs on |sources|
    rows against a 1-row scalar broadcast."""
    from unified_firmographic_data_pipeline_spark.operators.dedup import dedup_exact

    kept = dedup_exact(docs, text_col, id_col)
    per = (
        kept.select(
            F.col(source_col).alias("source"),
            F.size(tokens(text_col)).cast("long").alias("nt"),
        )
        .groupBy("source")
        .agg(F.sum("nt").alias("unique_tokens"))
    )
    wt = per.select(
        "source",
        "unique_tokens",
        F.round(F.pow(F.col("unique_tokens").cast("double"), F.lit(alpha)) * 1e6)
        .cast("long")
        .alias("weight_micro"),
    )
    tot = wt.agg(
        F.sum("weight_micro").alias("tw"),
        (F.lit(target_epochs) * F.sum("unique_tokens")).alias("b"),
    )
    calc = wt.crossJoin(tot).select(
        "source",
        "unique_tokens",
        "weight_micro",
        F.expr("(b * weight_micro) div tw").alias("base_quota"),
    )
    cap = F.lit(max_epochs) * F.col("unique_tokens")
    return calc.select(
        "source",
        "unique_tokens",
        "weight_micro",
        F.col("base_quota").cast("long").alias("base_quota"),
        F.least(F.col("base_quota"), cap).cast("long").alias("quota_tokens"),
        (F.col("base_quota") > cap).alias("is_capped"),
        F.expr("(least(base_quota, " + str(max_epochs) + " * unique_tokens)"
               " * 1000000) div unique_tokens").alias("epochs_micro"),
    )


def lexicon_flag_stats(
    docs: DataFrame,
    terms: Sequence[str],
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Blocklist audit per source: ``(source, n_docs, n_flagged,
    total_hits, flag_rate)`` where a doc is flagged iff ANY token
    (lowercased, exact match) is in ``terms``. The lexicon rides the
    plan as an array literal — no join, no broadcast variable."""
    lex = F.array(*[F.lit(t.lower()) for t in terms])
    hits = F.size(
        F.filter(tokens(text_col), lambda t: F.array_contains(lex, F.lower(t)))
    )
    per_doc = docs.select(
        F.col(source_col).alias("source"), hits.cast("long").alias("hits")
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.count(F.when(F.col("hits") > 0, 1)).cast("long").alias("n_flagged"),
            F.sum("hits").cast("long").alias("total_hits"),
        )
        .select(
            "source",
            "n_docs",
            "n_flagged",
            "total_hits",
            F.round(
                F.col("n_flagged").cast("double") / F.col("n_docs").cast("double"), 6
            ).alias("flag_rate"),
        )
    )

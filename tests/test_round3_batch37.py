"""Reference-implementation tests for batch-37 evaluation metrics:
AUC-ROC (vs a direct pairwise computation), P/R@k + MRR, nDCG@10, and
the thresholded confusion matrix — all against sklearn-free Python
references on the same (label, score) pairs."""

from __future__ import annotations

import math
import re

import duckdb

import __spark_entry__ as m

QUERIES = m.queries()


def _pairs(spark, sf_small):
    from pyspark.sql import functions as F

    from unified_firmographic_data_pipeline_spark.functions.scoring import logistic_score
    from unified_firmographic_data_pipeline_spark.functions.text import (
        LANG_STOPWORDS,
        punct_ratio,
        stopword_ratio,
    )

    d = spark.read.parquet(f"{sf_small}/documents.parquet")
    stop_r = F.coalesce(stopword_ratio("text", LANG_STOPWORDS["en"]), F.lit(0.0))
    punct_r = F.coalesce(punct_ratio("text"), F.lit(1.0))
    len_norm = F.least(F.length("text"), F.lit(2000)).cast("double") / F.lit(2000.0)
    score = F.round(
        logistic_score([(stop_r, 3.0), (punct_r, -2.0), (len_norm, 1.0)], intercept=-1.5), 6
    )
    return [
        (r["doc_id"], r["lang"] == "en", r["s"])
        for r in d.select("doc_id", "lang", score.alias("s")).collect()
    ]


def test_auc_matches_pairwise_probability(spark, sf_small):
    row = QUERIES["auc_quality_vs_lang"](spark, sf_small).collect()[0]
    pairs = _pairs(spark, sf_small)
    pos = [s for _, lab, s in pairs if lab]
    neg = [s for _, lab, s in pairs if not lab]
    wins = sum(
        1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg
    )
    auc = wins / (len(pos) * len(neg))
    assert row["n_pos"] == len(pos) and row["n_neg"] == len(neg)
    assert abs(row["auc_roc"] - auc) < 1e-9
    assert 0.0 <= row["auc_roc"] <= 1.0


def test_precision_recall_mrr_match_python(spark, sf_small):
    out = {r["k"]: r for r in QUERIES["precision_recall_at_k"](spark, sf_small).collect()}
    pairs = _pairs(spark, sf_small)
    ranked = sorted(pairs, key=lambda t: (-t[2], t[0]))
    labels = [lab for _, lab, _ in ranked]
    n_pos = sum(labels)
    fr = next(i + 1 for i, lab in enumerate(labels) if lab)
    for k in (10, 50, 100):
        tp = sum(labels[:k])
        assert out[k]["tp_at_k"] == tp
        assert abs(out[k]["precision_at_k"] - tp / k) < 1e-9
        assert abs(out[k]["recall_at_k"] - tp / n_pos) < 1e-9
        assert abs(out[k]["mrr"] - 1.0 / fr) < 1e-9


def test_ndcg_matches_python(spark, sf_small):
    row = QUERIES["ndcg_at_10_quality"](spark, sf_small).collect()[0]
    pairs = _pairs(spark, sf_small)
    ranked = sorted(pairs, key=lambda t: (-t[2], t[0]))
    rels = [1 if lab else 0 for _, lab, _ in ranked]
    dcg = sum(r / math.log2(i + 2) for i, r in enumerate(rels[:10]))
    ideal = sorted(rels, reverse=True)
    idcg = sum(r / math.log2(i + 2) for i, r in enumerate(ideal[:10]))
    assert abs(row["dcg_at_10"] - dcg) < 1e-3
    assert abs(row["idcg_at_10"] - idcg) < 1e-3
    assert abs(row["ndcg_at_10"] - dcg / idcg) < 1e-4
    assert 0.0 <= row["ndcg_at_10"] <= 1.0


def test_confusion_matrix_matches_python(spark, sf_small):
    row = QUERIES["confusion_matrix_at_threshold"](spark, sf_small).collect()[0]
    pairs = _pairs(spark, sf_small)
    tp = sum(1 for _, lab, s in pairs if s >= 0.5 and lab)
    fp = sum(1 for _, lab, s in pairs if s >= 0.5 and not lab)
    tn = sum(1 for _, lab, s in pairs if s < 0.5 and not lab)
    fn = sum(1 for _, lab, s in pairs if s < 0.5 and lab)
    assert (row["tp"], row["fp"], row["tn"], row["fn"]) == (tp, fp, tn, fn)
    assert abs(row["accuracy"] - (tp + tn) / len(pairs)) < 1e-9
    assert abs(row["f1"] - 2 * tp / (2 * tp + fp + fn)) < 1e-9

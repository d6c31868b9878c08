"""Physical-plan quality gate over the whole query inventory.

Catches scale regressions mechanically: a CartesianProduct or an unexpected
BroadcastNestedLoopJoin in any registered query is a plan that dies at
100 TB, even if the sf0.001 result is correct. Also pins filter pushdown on
the selective scan queries.
"""

from __future__ import annotations

import contextlib
import io

import pytest

import __spark_entry__ as entry_mod

QUERIES = entry_mod.queries()

#: BNLJ is acceptable only where the build side is structurally tiny or the
#: pairing is the documented exact baseline of an LSH scale path:
#: - q11/q22: 1-row scalar-aggregate broadcast (the in-plan scalar subquery)
#: - ann_cosine_topk: brute-force baseline — broadcasts the bounded query
#:   set; linear in corpus, the scale path is ann_cosine_topk_lsh
#: - embedding_dup_pairs: exact pair scoring on a bounded id-range subset;
#:   the scale path is embedding_dup_pairs_lsh
#: - unigram_logprob_scores / tfidf_top_terms: 1-row corpus-total /
#:   doc-count aggregate cross-joined broadcast onto the (vocabulary-sized)
#:   idf/logprob table — same scalar-subquery shape as q11/q22
BNLJ_ALLOWED = {
    "q11_share_of_total_having",
    "q22_idle_rich_customers",
    "ann_cosine_topk",
    "embedding_dup_pairs",
    "unigram_logprob_scores",
    "tfidf_top_terms",
    # structurally-1-row broadcast (corpus token total) joined to the
    # distinct-token counts — same scalar-subquery shape as q11
    "heavy_hitter_tokens",
    # three 1-row funnel-stage counts cross-joined into one summary row
    "funnel_click_signup_purchase",
    # 1-row basket-total aggregate broadcast into the lift expression —
    # same scalar-subquery shape as q11/heavy_hitter_tokens
    "basket_rules_lift",
    # 1-row corpus scalars (N, avgdl) broadcast into the idf table —
    # same scalar-subquery shape as tfidf_top_terms
    "bm25_query_scores",
    # 1-row vocabulary-size scalar broadcast into the add-k denominator —
    # same scalar-subquery shape as unigram_logprob_scores
    "bigram_surprisal_scores",
    # four 1-row pair-count aggregates cross-joined into one summary row —
    # the funnel_click_signup_purchase shape
    "blocking_quality_audit",
    # 1-row normalizing-total broadcast into the vocab-sized distribution —
    # same scalar-subquery shape as heavy_hitter_tokens
    "skipgram_negative_sampling_table",
    # 3-row literal threshold axis broadcast onto the scored pairs —
    # the bounded-axis sweep shape (neardup_threshold_sweep)
    "er_threshold_sweep",
    # 1-row wedge/degree totals x 1-row triangle count -> one summary row
    "triangle_stats_copurchase",
    # 1-row (n_days, total) broadcast into the per-day deviation expression
    "cusum_changepoint_daily",
    # 1-row key-count total broadcast into the permille expression
    "skew_report_custkey",
    # fixed 5-row checkpoint axis broadcast onto the first-seen table
    "heaps_law_vocab_growth",
    # 1-row max-doc-id scalar broadcast into the bucket expression —
    # same scalar-subquery shape as q11/heavy_hitter_tokens
    "ngram_novelty_decay",
    # two 1-row scalars (weight total, leftover) broadcast onto the
    # |sources|-row quota table — the bounded-axis allocation shape
    "source_mix_temperature_plan",
    # 1-row (weight total, budget) scalar broadcast onto the
    # |sources|-row allocation — same shape
    "epoch_allocation_plan",
    # two 1-row per-side row counts broadcast onto the key-axis diff —
    # the funnel/blocking-audit scalar shape
    "json_key_drift_audit",
    # three 1-row scalars (sums, cluster count, class count) folded into
    # one summary row — the blocking_quality_audit shape
    "bcubed_dedup_eval",
    # 1-row chunk-count total broadcast into the PMI expression
    "chunk_pmi_collocations",
    # calendar-bounded pairing: the per-DAY series (rows = days, not data)
    # self-pairs under d < d' — O(days^2) integers regardless of sf
    "kendall_tau_daily",
    # 1-row corpus-max-date broadcast into the censoring expression
    "kaplan_meier_order_gaps",
    # 1-row vocabulary-count scalar broadcast onto the selected tokens —
    # same scalar-subquery shape as unigram_logprob_scores
    "mlm_masking_plan",
    # bounded-axis cross: QI classes x ordered sensitive values (15 x 8
    # AGGREGATED rows — axes, never data; the kendall_tau_daily shape)
    "tcloseness_audit",
    # 1-row (n_tot, pos_tot) totals broadcast onto the 5-row priority
    # axis — the q11/heavy_hitter_tokens scalar-subquery shape
    "brier_score_decomposition",
    # 1-row LM totals (na, nt, V) broadcast into the log-ratio table —
    # same scalar-subquery shape as unigram_logprob_scores
    "dsir_importance_topk",
    # 1-row edge-total x 1-row in-support-count -> the support-0 row
    "truss_edge_support_hist",
    # 1-row point-estimate aggregate x 1-row resample-moment aggregate
    "bootstrap_ci_order_value",
    # 1-row pooled-covariance aggregate broadcast onto 2 variant rows
    "cuped_adjusted_ab",
    # 1-row corpus totals + fixed 3-row k-axis broadcast onto the ranked
    # vocabulary (the heaps_law checkpoint-axis shape)
    "vocab_coverage_topk",
    # 1-row weight-total aggregate broadcast onto 5 stratum rows
    "neyman_allocation_by_type",
    # 1-row method-of-moments prior broadcast onto the part aggregate
    "eb_shrunk_return_rates",
    # calendar-bounded day-pair pairings (the kendall_tau_daily shape)
    "theilsen_slope_daily",
    "mann_kendall_trend_daily",
    # 1-row corpus-size broadcast into the rank-index expression
    "quantile_normalize_quality",
    # |sources|^2-bounded source-pair axis broadcast onto the vocabulary
    "js_divergence_sources",
    # 1-row n_pos / first-hit-rank aggregates + fixed 3-row k-axis
    "precision_recall_at_k",
    # 1-row DCG x 1-row ideal-DCG -> one metric row
    "ndcg_at_10_quality",
    # 1-row (n, r, c) contingency totals broadcast onto the (r x c)-bounded
    # cell universe — same scalar-subquery shape as q11
    "cramers_v_pairs",
    # 1-row pooled-slope aggregate broadcast onto <=4 rollup rows
    "simpsons_paradox_slopes",
    # 1-row corpus-total then 1-row weight-sum broadcast onto |langs| rows
    "temperature_sampling_weights",
    # 1-row edge-total broadcast into the per-community term, then 1-row
    # node/edge counts cross-joined onto the single summary row
    "modularity_onehop_communities",
    # 1-row residual-moment aggregate broadcast onto the day series
    "stl_residual_outliers",
    # 1-row member-count aggregate cross-joined onto the summary row
    "bloom_filter_fpr",
    # 1-row edge-total cross-joined onto the single bridge-count row
    "local_bridges_count",
    # the ann_cosine_topk shape: bounded query sample broadcast against
    # the corpus scan under a non-equi (qid != nid) condition
    "knn_label_accuracy",
    # 1-row state-count broadcast seeding the uniform start vector
    "markov_stationary_distribution",
    # 1-row corpus-max-timestamp broadcast into the decay expression —
    # the kaplan_meier_order_gaps shape
    "decayed_event_scores",
    # 1-row agreement total x 1-row marginal product -> one kappa row
    "cohens_kappa_langid",
    # 1-row disagreement total x 1-row pooled-category square sum -> one
    # alpha row — the cohens_kappa_langid shape
    "krippendorff_alpha_langid",
    # 1-row modal-path broadcast onto the session-path table
    "session_path_edit_distance",
    # two 1-row variant aggregates pivoted into one summary row
    "two_proportion_ztest",
    # three 1-row pair-set cardinalities -> one P/R/F1 row
    "dedup_detector_pr",
    # 1-row baseline decile-edge array broadcast onto the scan, then the
    # bounded bin axis joins the baseline fractions
    "psi_drift_sources",
    # 1-row measured-baseline aggregate x fixed 3-row MDE grid
    "ab_sample_size_planner",
    # constant 48-row parameter grid (4x3x4 literal cross) — no scan
    "lsh_s_curve_planner",
    # the ann_cosine_topk shape: bounded query signatures broadcast against
    # the corpus signature scan under qid != nid; floats only at re-rank
    "bq_hamming_topk",
    # same shape on the 16-dim PROJECTED vectors (the JL tier's shortlist)
    "rp_projection_topk",
    # the exact ground-truth side is ann_cosine_topk's bounded broadcast;
    # the IVF side and the eval join are equi-joins
    "ann_recall_at_k_ivf",
    # the ann_cosine_topk shape: 8 bounded anchors broadcast against the
    # corpus scan under qid != nid; positives/negatives rank in one window
    "contrastive_triplets_mined",
    # retrieval stage is the ann_cosine_topk shape (4 bounded queries);
    # the MMR loop itself is applyInPandas over the query_id grouping
    "mmr_rerank_topk",
    # |sources|^2-bounded pair axis broadcast (the js_divergence_sources
    # shape); each pair carries at most 2k sketch rows
    "kmv_vocab_source_overlap",
    # trained-PQ ADC: 5 bounded queries (each carrying its m×k ADC table)
    # broadcast against the corpus code scan under qid != nid — the
    # bq_hamming_topk shape
    "pq_adc_topk",
    # 4 truncation tiers scored in one pass: 5 bounded queries broadcast
    # against the corpus scan under qid != nid — the ann_cosine_topk shape
    "matryoshka_recall_tiers",
    # two retrievers, each 3 bounded queries broadcast against the corpus
    # scan under qid != nid (the ann_cosine_topk shape); the fusion itself
    # is an equi-keyed hash agg over top-k-bounded lists
    "retriever_rrf_fusion_topk",
    # 1-row straddle-count scalar broadcast onto the 2-row per-split
    # aggregate — the bcubed_dedup_eval summary shape
    "leakage_safe_split_counts",
    # 5 bounded queries broadcast against the corpus scan under
    # qid != nid (the ann_cosine_topk shape); label attach is equi-keyed
    "hard_negative_candidates",
}

#: Selective scans that must keep non-trivial parquet filter pushdown.
MUST_PUSH_FILTERS = [
    "q03_shipping_priority",
    "q06_forecast_revenue",
    "q10_returned_items",
    "q14_promo_revenue_share",
    "q19_disjunctive_filter",
]


def _formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_scale_hostile_joins(name: str, spark, sf_small: str):
    plan = _formatted_plan(QUERIES[name](spark, sf_small))
    assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"
    if name not in BNLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: unexpected nested-loop join (non-equi or missing key?)"
        )


@pytest.mark.parametrize("name", MUST_PUSH_FILTERS)
def test_filters_reach_the_scan(name: str, spark, sf_small: str):
    plan = _formatted_plan(QUERIES[name](spark, sf_small))
    pushed = [
        line for line in plan.splitlines()
        if "PushedFilters" in line and "PushedFilters: []" not in line
    ]
    assert pushed, f"{name}: no non-empty PushedFilters in any scan"

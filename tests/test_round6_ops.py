"""Round-6 operators: contrastive triplet mining (hard negatives) and
curriculum interleave ordering. Both are oracle-parity-checked in the
registry; these tests pin semantics on adversarial micro-inputs the
parity hash can't isolate (dropped anchors, rank resets, round-robin
structure, margin arithmetic)."""

from pyspark.sql import functions as F


def _vec(*xs):
    return [float(x) for x in xs]


def test_contrastive_triplets_hardest_pos_and_negs(spark):
    from unified_firmographic_data_pipeline_spark.operators.similarity import (
        contrastive_triplets,
    )

    # 2-d vectors with known cosines to the anchor (1, 0):
    #   id 1 label A (0.8, 0.6)   cos = 0.8  <- hardest positive
    #   id 2 label A (0.6, 0.8)   cos = 0.6  (weaker positive, ignored)
    #   id 3 label B (0.9, 0.435890) cos ~ 0.9  <- hardest negative
    #   id 4 label B (0.0, 1.0)   cos = 0.0  (rank-2 negative)
    #   id 5 label C (-1.0, 0.0)  cos = -1.0 (rank-3 negative)
    rows = [
        (0, "A", _vec(1, 0)),
        (1, "A", _vec(0.8, 0.6)),
        (2, "A", _vec(0.6, 0.8)),
        (3, "B", _vec(0.9, 0.43589)),
        (4, "B", _vec(0, 1)),
        (5, "C", _vec(-1, 0)),
    ]
    df = spark.createDataFrame(rows, "vec_id long, label string, embedding array<float>")
    out = contrastive_triplets(
        df, df.filter(F.col("vec_id") == 0), k_neg=3
    ).orderBy("neg_rank").collect()

    assert [r["pos_id"] for r in out] == [1, 1, 1]
    assert all(r["pos_sim"] == 0.8 for r in out)
    assert [(r["neg_id"], r["neg_rank"]) for r in out] == [(3, 1), (4, 2), (5, 3)]
    # margin = pos_sim - neg_sim, exact difference of the rounded sims
    for r in out:
        assert r["margin"] == r["pos_sim"] - r["neg_sim"]
    # the hardest negative is HARDER than the positive -> negative margin,
    # the triplet a metric learner actually needs
    assert out[0]["margin"] < 0 < out[1]["margin"]


def test_contrastive_triplets_anchor_without_positive_drops(spark):
    from unified_firmographic_data_pipeline_spark.operators.similarity import (
        contrastive_triplets,
    )

    rows = [
        (0, "X", _vec(1, 0)),  # only X-labeled vector: no positive exists
        (1, "Y", _vec(0.5, 0.5)),
        (2, "Y", _vec(0.9, 0.1)),
    ]
    df = spark.createDataFrame(rows, "vec_id long, label string, embedding array<float>")
    out = contrastive_triplets(df, df, k_neg=2)
    qids = {r["query_id"] for r in out.collect()}
    assert 0 not in qids, "anchor with no same-label neighbor must drop"
    assert {1, 2} <= qids  # Y anchors have a positive (each other)


def test_contrastive_triplets_single_scan_broadcast_plan(spark):
    """The anchor set broadcasts and positives/negatives rank in ONE
    window pass — no second corpus scan, no shuffled join on the scored
    pairs."""
    import contextlib
    import io

    from unified_firmographic_data_pipeline_spark.operators.similarity import (
        contrastive_triplets,
    )

    rows = [(i, i % 3, _vec(i + 1, 1)) for i in range(12)]
    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<float>")
    out = contrastive_triplets(df, df.filter(F.col("vec_id") < 2), k_neg=2)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_curriculum_interleave_round_robin_order(spark):
    from unified_firmographic_data_pipeline_spark.operators.curation import (
        curriculum_interleave,
    )

    # two domains, quality descending inside each; doc_id tiebreak for the
    # two equal-quality src_b docs
    rows = [
        (1, "src_a", 0.9), (2, "src_a", 0.5), (3, "src_a", 0.1),
        (4, "src_b", 0.8), (5, "src_b", 0.8), (6, "src_b", 0.2),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, q double")
    cur = curriculum_interleave(df, F.col("q"), domain_col="source")
    got = [
        (r["doc_id"], r["source"], r["domain_rank"])
        for r in cur.orderBy("domain_rank", "source").collect()
    ]
    # round-robin: rank-1 of every domain first (best examples), then rank-2...
    assert got == [
        (1, "src_a", 1), (4, "src_b", 1),
        (2, "src_a", 2), (5, "src_b", 2),   # doc 4 < doc 5 at equal q
        (3, "src_a", 3), (6, "src_b", 3),
    ]


def test_curriculum_interleave_partitions_by_domain_only(spark):
    """The operator itself must add domain_rank with a BY-DOMAIN window —
    no global (empty-partition) window inside the operator: the total
    order is the caller's range sort, so 100 TB never funnels through one
    reducer here."""
    import contextlib
    import io

    from unified_firmographic_data_pipeline_spark.operators.curation import (
        curriculum_interleave,
    )

    df = spark.createDataFrame(
        [(i, f"s{i % 4}", float(i)) for i in range(20)],
        "doc_id long, source string, q double",
    )
    cur = curriculum_interleave(df, F.col("q"), domain_col="source")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cur.explain()
    plan = buf.getvalue()
    assert "Window" in plan
    # a global window shows an empty partition spec: "windowspecdefinition(q"
    # with no partition column before the order column; the by-domain one
    # carries `source#...` in the spec
    assert "partitionBy" not in plan  # sanity: simple-mode never prints this
    import re

    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs and all("source#" in s for s in specs), specs


def test_kmv_estimate_exact_below_k_and_consistent_above(spark):
    """Below k distinct values the sketch holds everything -> estimate is
    EXACT; above k the (k-1)/max(hv) estimator lands within the standard
    KMV error envelope (~1/sqrt(k)) on uniform md5 fractions."""
    from unified_firmographic_data_pipeline_spark.operators.sketches import (
        kmv_estimate,
        kmv_sketch,
    )

    rows = [("small", f"v{i}") for i in range(10)] + [
        ("big", f"w{i}") for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "source string, val string")
    est = {
        r["grp"]: r
        for r in kmv_estimate(kmv_sketch(df, "val", k=64), k=64).collect()
    }
    assert est["small"]["n_sketch"] == 10
    assert est["small"]["distinct_est"] == 10.0
    assert est["big"]["n_sketch"] == 64
    # 2000 true distinct; 4/sqrt(64) = 50% is a generous deterministic
    # bound — md5 on this fixed vocabulary is a fixed draw, not flaky
    assert abs(est["big"]["distinct_est"] - 2000) / 2000 < 0.5


def test_kmv_sketch_is_mergeable_by_union_and_retruncation(spark):
    """The defining sketch property: k smallest of (sketch(A) ∪ sketch(B))
    == sketch(A ∪ B) for disjoint loads of the same group — so nightly
    parquet-landed sketches merge without touching raw history."""
    from pyspark.sql import functions as F
    from unified_firmographic_data_pipeline_spark.operators.sketches import (
        kmv_sketch,
    )

    rows = [("s", f"t{i}") for i in range(500)]
    df = spark.createDataFrame(rows, "source string, val string")
    half_a = df.filter(F.length("val") % 2 == 0)
    half_b = df.filter(F.length("val") % 2 == 1)
    full = {r["hv"] for r in kmv_sketch(df, "val", k=32).collect()}
    sa = kmv_sketch(half_a, "val", k=32)
    sb = kmv_sketch(half_b, "val", k=32)
    merged_rows = sorted(
        {r["hv"] for r in sa.unionByName(sb).collect()}
    )[:32]
    assert set(merged_rows) == full


def test_kmv_pairwise_overlap_matches_protocol(spark):
    """3 groups with constructed overlap: X = k-min of the sketch union,
    jaccard = |X ∩ A ∩ B|/|X|; with < k values everything is exact, so the
    estimates must EQUAL the true set statistics."""
    from unified_firmographic_data_pipeline_spark.operators.sketches import (
        kmv_pairwise_overlap,
        kmv_sketch,
    )

    a = [f"c{i}" for i in range(20)]          # A: c0..c19
    b = [f"c{i}" for i in range(10, 30)]      # B: c10..c29 (|A∩B| = 10)
    c = [f"z{i}" for i in range(5)]           # C: disjoint
    rows = [("A", v) for v in a] + [("B", v) for v in b] + [("C", v) for v in c]
    df = spark.createDataFrame(rows, "source string, val string")
    out = {
        (r["grp_a"], r["grp_b"]): r
        for r in kmv_pairwise_overlap(kmv_sketch(df, "val", k=64), k=64).collect()
    }
    ab = out[("A", "B")]
    assert ab["k_used"] == 30 and ab["n_common"] == 10
    assert ab["jaccard_est"] == round(10 / 30, 6)
    assert ab["union_est"] == 30.0
    assert ab["intersection_est"] == round(10 / 30 * 30.0, 6)
    ac = out[("A", "C")]
    assert ac["n_common"] == 0 and ac["jaccard_est"] == 0.0
    assert ac["union_est"] == 25.0
    # every unordered pair appears exactly once, ordered
    assert set(out) == {("A", "B"), ("A", "C"), ("B", "C")}


def test_kmv_pairwise_overlap_plan_has_no_cartesian(spark):
    import contextlib
    import io

    from unified_firmographic_data_pipeline_spark.operators.sketches import (
        kmv_pairwise_overlap,
        kmv_sketch,
    )

    df = spark.createDataFrame(
        [(f"s{i % 3}", f"v{i}") for i in range(60)], "source string, val string"
    )
    out = kmv_pairwise_overlap(kmv_sketch(df, "val", k=8), k=8)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan, "pair axis must broadcast (BNLJ)"


def test_kmv_merge_equals_rebuild_and_is_idempotent(spark):
    """kmv_merge(sketch(A), sketch(B)) == kmv_sketch(A ∪ B) even when the
    loads OVERLAP (shared values dedupe to one entry), and merging a
    sketch with itself is the identity — the two properties that make
    nightly landed sketches safe to fold without raw history."""
    from unified_firmographic_data_pipeline_spark.operators.sketches import (
        kmv_merge,
        kmv_sketch,
    )

    rows = [("s", f"t{i}") for i in range(300)]
    df = spark.createDataFrame(rows, "source string, val string")
    # overlapping halves: t0..t199 and t100..t299
    a = df.filter(F.col("val").substr(2, 10).cast("int") < 200)
    b = df.filter(F.col("val").substr(2, 10).cast("int") >= 100)
    sa, sb = kmv_sketch(a, "val", k=32), kmv_sketch(b, "val", k=32)
    full = sorted(r["hv"] for r in kmv_sketch(df, "val", k=32).collect())
    merged = sorted(r["hv"] for r in kmv_merge(sa, sb, k=32).collect())
    assert merged == full
    self_merged = sorted(r["hv"] for r in kmv_merge(sa, sa, k=32).collect())
    assert self_merged == sorted(r["hv"] for r in sa.collect())


def test_mutual_nearest_pairs_filters_one_directional_hubs(spark):
    """A hub vector appears in many points' top-1 lists without those
    points appearing in ITS top-k — the reciprocity gate must keep only
    genuinely mutual pairs, canonical and deduped."""
    from unified_firmographic_data_pipeline_spark.operators.similarity import (
        cosine_topk_lsh,
        mutual_nearest_pairs,
    )

    # 4-d: ids 1/2 are a tight mutual pair; ids 3,4,5 all point at hub 0
    # as their nearest, but 0's top-1 is... make 0 closest to 6 (its twin)
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),      # hub
        (6, [0.99, 0.01, 0.0, 0.0]),    # hub's true twin (mutual with 0)
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [0.0, 0.99, 0.01, 0.0]),    # mutual with 1
        (3, [0.8, 0.0, 0.6, 0.0]),      # near hub, one-directional
        (4, [0.8, 0.0, 0.0, 0.6]),      # near hub, one-directional
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    kw = dict(num_planes=2, dim=4, seed=7)  # coarse buckets: high recall
    out = {
        (r["id_a"], r["id_b"])
        for r in mutual_nearest_pairs(df, k=1, bucket_kwargs=kw).collect()
    }
    # with k=1 only true reciprocal nearest neighbors survive
    topk = cosine_topk_lsh(df, df, k=1, **kw)
    top1 = {r["query_id"]: r["neighbor_id"] for r in topk.collect()}
    expect = {
        (min(a, b), max(a, b))
        for a, b in top1.items()
        if top1.get(b) == a
    }
    assert out == expect
    assert (0, 6) in out and (1, 2) in out
    # the one-directional hub attractions must NOT survive
    assert not any(3 in p or 4 in p for p in out)


def test_fs_em_recovers_planted_mixture(spark):
    """Plant a two-component mixture with known m/u/p and verify EM
    recovers the parameters from UNLABELED pairs: matches agree on both
    fields ~always, unmatches ~never — a well-separated mixture EM must
    nail within a few percent. Deterministic: fixed pairs, fixed init."""
    import itertools

    from unified_firmographic_data_pipeline_spark.operators.linkage import (
        agreement_patterns,
        fs_em_fit,
        fs_em_parameters,
    )

    # 200 matched pairs: a1 agrees 95%, a2 agrees 90%
    # 1800 unmatched pairs: a1 agrees 10%, a2 agrees 5%
    rows = []
    for i in range(200):
        rows.append((i % 20 < 19, i % 10 < 9))
    for i in range(1800):
        rows.append((i % 10 == 0, i % 20 == 0))
    df = spark.createDataFrame(rows, "a1 boolean, a2 boolean")

    pats = agreement_patterns(df, ["a1", "a2"])
    assert len(pats) <= 4 and sum(p[-1] for p in pats) == 2000
    assert pats == sorted(pats), "patterns must be in sorted (replayable) order"

    fit = fs_em_fit(pats, 2)
    assert abs(fit["p"] - 0.1) < 0.04, fit
    assert abs(fit["m"][0] - 0.95) < 0.08 and abs(fit["m"][1] - 0.90) < 0.08, fit
    assert fit["u"][0] < 0.15 and fit["u"][1] < 0.10, fit

    out = {r["field"]: r for r in fs_em_parameters(df, ["a1", "a2"]).collect()}
    assert out["a1"]["weight_agree"] > 2.0, "agreement must carry positive evidence"
    assert out["a1"]["weight_disagree"] < 0.0
    assert out["a1"]["p"] == out["a2"]["p"]

    # determinism: same inputs -> bit-identical parameters
    again = {r["field"]: r for r in fs_em_parameters(df, ["a1", "a2"]).collect()}
    for f in ("a1", "a2"):
        assert out[f] == again[f]


def test_kanonymity_report_and_generalization(spark):
    """Constructed dataset with known equivalence classes: 2 QI columns,
    one singleton class (k-violation), one class lacking sensitive
    diversity. The report must count rows-at-risk (rows, not classes) and
    the dropped-column search must rank the column whose removal saves
    the most rows first."""
    from unified_firmographic_data_pipeline_spark.quality.privacy import (
        generalization_candidates,
        kanonymity_classes,
        kanonymity_report,
    )

    rows = (
        # class (30, "x"): 3 rows, sensitive diverse
        [(30, "x", "d1"), (30, "x", "d2"), (30, "x", "d3")]
        # class (30, "y"): 3 rows, sensitive CONSTANT -> l-violation
        + [(30, "y", "d1")] * 3
        # class (40, "x"): singleton -> k-violation at k=2
        + [(40, "x", "d2")]
    )
    df = spark.createDataFrame(rows, "age int, zip string, diag string")

    cls = {
        (r["age"], r["zip"]): (r["class_size"], r["l_distinct"])
        for r in kanonymity_classes(df, ["age", "zip"], "diag").collect()
    }
    assert cls == {(30, "x"): (3, 3), (30, "y"): (3, 1), (40, "x"): (1, 1)}

    rep = kanonymity_report(df, ["age", "zip"], k=2, sensitive_col="diag", l=2).collect()[0]
    assert rep["k"] == 2 and rep["n_classes"] == 3 and rep["n_rows"] == 7
    assert rep["min_class_size"] == 1 and not rep["is_k_anonymous"]
    assert rep["classes_below_k"] == 1 and rep["rows_at_risk"] == 1
    assert rep["min_l"] == 1 and rep["classes_below_l"] == 2
    assert not rep["is_l_diverse"]

    # dropping zip merges (40,x) into the age=40... no: age 40 stays a
    # singleton on its own, but dropping AGE merges (40,"x") into "x" (4
    # rows) -> zero rows at risk; dropping zip leaves age=40 a singleton
    cand = [(r["dropped"], r["rows_at_risk"])
            for r in generalization_candidates(df, ["age", "zip"], k=2).collect()]
    assert cand[0] == ("age", 0), cand
    assert ("zip", 1) in cand and ("(none)", 1) in cand


def test_dominant_script_and_script_counts(spark):
    from unified_firmographic_data_pipeline_spark.functions.scripts import (
        dominant_script,
        script_counts,
    )

    rows = [
        (1, "hello world"),                       # latin
        (2, "привет мир"),                        # cyrillic
        (3, "你好世界你好"),                        # cjk
        (4, "مرحبا بالعالم"),                      # arabic
        (5, "γεια σου κόσμε"),                     # greek
        (6, "こんにちは"),                          # kana
        (7, "12345 !!!"),                          # no script chars -> und
        (8, "hello мир мир"),                      # cyrillic 6 > latin 5
        (9, None),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {
        r["id"]: r["s"]
        for r in df.select("id", dominant_script("text").alias("s")).collect()
    }
    assert out == {
        1: "latin", 2: "cyrillic", 3: "cjk", 4: "arabic", 5: "greek",
        6: "kana", 7: "und", 8: "cyrillic", 9: None,
    }
    counts = df.filter(F.col("id") == 8).select(
        *[c.alias(n) for n, c in script_counts("text").items()]
    ).collect()[0]
    assert counts["latin"] == 5 and counts["cyrillic"] == 6


def test_mojibake_and_replacement_signals(spark):
    from unified_firmographic_data_pipeline_spark.functions.scripts import (
        mojibake_hits,
        mojibake_score,
        replacement_char_ratio,
    )

    rows = [
        (1, "itâ€™s a test with Ã© and Ã¨ artifacts"),  # classic wrecks
        (2, "perfectly clean text, no artifacts here"),
        (3, "lossy �� transcode �"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r["id"]: (r["hits"], r["score"], r["rep"])
        for r in df.select(
            "id",
            mojibake_hits("text").alias("hits"),
            mojibake_score("text").alias("score"),
            replacement_char_ratio("text").alias("rep"),
        ).collect()
    }
    assert got[1][0] == 3 and got[1][1] > 0
    assert got[2] == (0, 0.0, 0.0)
    assert got[3][2] == 3 / len("lossy �� transcode �")
    assert got[4] == (0, None, None)


def test_weighted_jaccard_exact_counts_repetition(spark):
    """Multiset vs set Jaccard on constructed profiles: repetition must
    matter (the set form calls doc 1 and 2 identical; the weighted form
    must not), and the min/max identity must reproduce hand-computed
    values exactly."""
    from unified_firmographic_data_pipeline_spark.operators.neardup import (
        weighted_jaccard_exact,
    )

    rows = [
        (1, "the the the cat"),       # {the:3, cat:1}
        (2, "the cat"),               # {the:1, cat:1}
        (3, "the cat sat"),           # {the:1, cat:1, sat:1}
        (4, "dog dog"),               # disjoint from 1-3
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r["id_a"], r["id_b"]): r
        for r in weighted_jaccard_exact(df, threshold=0.0).collect()
    }
    # J_w(1,2) = (min(3,1)+min(1,1)) / (max(3,1)+max(1,1)) = 2/4
    r12 = out[(1, 2)]
    assert (r12["w_common"], r12["w_a"], r12["w_b"]) == (2, 4, 2)
    assert r12["weighted_jaccard"] == 0.5
    # J_w(2,3) = 2/3
    assert out[(2, 3)]["weighted_jaccard"] == round(2 / 3, 6)
    # disjoint docs never pair (inverted index, no cross product)
    assert not any(4 in p for p in out)


def test_multiset_minhash_estimates_weighted_jaccard(spark):
    """The unary-expansion sketch: identical multisets estimate 1.0 with
    zero error; distinct-but-overlapping profiles estimate within the
    16-hash resolution (err is a multiple of 1/16, |err| well inside the
    binomial envelope on this fixed corpus — deterministic, not flaky)."""
    from unified_firmographic_data_pipeline_spark.operators.neardup import (
        weighted_jaccard_estimate_vs_exact,
    )

    rows = [
        (1, "alpha alpha beta gamma"),
        (2, "alpha alpha beta gamma"),       # identical multiset -> J_w = 1
        (3, "alpha beta beta gamma delta"),  # overlapping, different counts
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r["id_a"], r["id_b"]): r
        for r in weighted_jaccard_estimate_vs_exact(df, threshold=0.1).collect()
    }
    r12 = out[(1, 2)]
    assert r12["weighted_jaccard"] == 1.0 and r12["mh_est"] == 1.0 and r12["err"] == 0.0
    r13 = out[(1, 3)]
    # exact: min sums = alpha 1 + beta 1 + gamma 1 = 3; max = 2+2+1+1 = 6
    assert r13["weighted_jaccard"] == 0.5
    assert abs(r13["err"]) <= 0.25  # within 4/16 on a 16-hash sketch
    assert round(r13["mh_est"] * 16) == r13["mh_est"] * 16  # multiple of 1/16


def test_doctype_signals_and_router(spark):
    from unified_firmographic_data_pipeline_spark.functions.doctype import (
        classify_doctype,
        delimiter_line_ratio,
        ident_token_ratio,
        symbol_density,
    )

    code = (
        "def main(argv):\n"
        "    result = compute_value(argv[0]);\n"
        "    if result > THRESHOLD_MAX:\n"
        "        return frob.nicate(result)\n"
    )
    prose = (
        "The quick brown fox jumps over the lazy dog. It was a bright\n"
        "cold day in April and the clocks were striking thirteen.\n"
    )
    table = (
        "name | qty | price\n"
        "apple | 3 | 1.20\n"
        "pear | 5 | 0.99\n"
    )
    rows = [(1, code), (2, prose), (3, table), (4, ""), (5, None)]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            symbol_density("text").alias("sym"),
            ident_token_ratio("text").alias("ident"),
            delimiter_line_ratio("text").alias("delim"),
            classify_doctype("text").alias("kind"),
        ).collect()
    }
    assert out[1]["kind"] == "code" and out[1]["sym"] > 0.04
    assert out[1]["ident"] > 0.15  # compute_value, THRESHOLD_MAX, frob.nicate...
    assert out[2]["kind"] == "prose" and out[2]["sym"] < 0.02 and out[2]["ident"] == 0.0
    assert out[3]["kind"] == "table" and out[3]["delim"] >= 0.5
    assert out[4]["kind"] is None and out[5]["kind"] is None


def test_entity_resolution_plan_planted_duplicates(spark):
    """plans/entities.py end to end on a constructed roster: three feeds
    of the same two companies (agreeing on every field) plus unrelated
    records that share only the block. EM must separate them and the
    golden pick must keep the best-ordered member."""
    from unified_firmographic_data_pipeline_spark.plans.entities import (
        candidate_pairs,
        em_match_weights,
        golden_records,
        resolve_entities,
    )

    # block 0: ids 1-3 are one true entity (all three fields agree),
    # ids 4-5 another (all agree), ids 6-9 unrelated filler records that
    # disagree on everything; block 1 mirrors the filler so the EM's
    # unmatch class has mass.
    rows = [
        (1, 0, "TECH", 7, 10, 900.0),
        (2, 0, "TECH", 7, 10, 950.0),
        (3, 0, "TECH", 7, 10, 920.0),
        (4, 0, "RETAIL", 2, 4, 100.0),
        (5, 0, "RETAIL", 2, 4, 300.0),
        (6, 0, "AUTO", 1, 3, 10.0),
        (7, 0, "ENERGY", 5, 8, 20.0),
        (8, 0, "MEDIA", 9, 1, 30.0),
        (9, 0, "FOOD", 4, 6, 40.0),
    ] + [
        (10 + i, 1, seg, i, i + 2, float(i))
        for i, seg in enumerate(
            ["AUTO", "ENERGY", "MEDIA", "FOOD", "TECH", "RETAIL", "BANK", "AIR"]
        )
    ]
    df = spark.createDataFrame(
        rows, "id long, blk long, seg string, nat long, bal long, score double"
    )
    fields = ["seg", "nat", "bal"]

    pairs = candidate_pairs(df, "id", "blk", fields)
    # 9 choose 2 + 8 choose 2 pairs, never cross-block
    assert pairs.count() == 36 + 28
    weights = em_match_weights(pairs, fields, n_iter=25)
    for f in fields:
        wa, wd = weights[f]
        assert wa > 0 > wd, f"EM failed to separate m/u for {f}: {weights[f]}"

    asg = {
        r["id"]: r["entity_id"]
        for r in resolve_entities(
            df, "id", "blk", fields, threshold_micro=2_000_000
        ).collect()
    }
    assert asg[1] == asg[2] == asg[3] == 1
    assert asg[4] == asg[5] == 4
    singles = [i for i in asg if i not in (1, 2, 3, 4, 5)]
    assert all(asg[i] == i for i in singles)

    g = golden_records(
        df,
        resolve_entities(df, "id", "blk", fields, threshold_micro=2_000_000),
        "id",
        [F.col("score").desc(), F.col("id").asc()],
    )
    got = {r["entity_id"]: (r["id"], r["n_members"]) for r in g.collect()}
    assert got[1] == (2, 3)   # id 2 has the best score in the TECH entity
    assert got[4] == (5, 2)   # id 5 wins the RETAIL entity
    assert got[6] == (6, 1)   # singletons keep themselves


def test_bigram_surprisal_matches_hand_model(spark):
    """operators/lm.py on a 3-doc corpus small enough to hand-compute:
    train counts, add-k smoothing of seen/unseen bigrams, micro-quantized
    sums and the perplexity proxy."""
    import math

    from unified_firmographic_data_pipeline_spark.operators.lm import (
        bigram_counts,
        doc_surprisal,
        unigram_counts,
    )

    train = spark.createDataFrame(
        [(0, "a b a b"), (2, "a b c")], "doc_id long, text string"
    )
    score = spark.createDataFrame(
        [(1, "a b z"), (3, "a"), (5, "")], "doc_id long, text string"
    )

    bi = {(r["w1"], r["w2"]): r["c12"] for r in bigram_counts(train).collect()}
    # train bigrams: (a,b)x3, (b,a)x1, (b,c)x1
    assert bi == {("a", "b"): 3, ("b", "a"): 1, ("b", "c"): 1}
    uni = {r["w1"]: r["c1"] for r in unigram_counts(train).collect()}
    # left-context counts: Σ_w2 c12(w1, w2) must equal c1(w1)
    assert uni == {"a": 3, "b": 2}

    out = {r["doc_id"]: r for r in doc_surprisal(score, train, k=0.5).collect()}
    # docs with < 2 tokens have no bigrams and drop out entirely
    assert set(out) == {1}
    v = 2.0  # distinct left-context unigrams
    lp_ab = math.log2((3 + 0.5) / (3 + 0.5 * v))   # seen bigram
    lp_bz = math.log2((0 + 0.5) / (2 + 0.5 * v))   # unseen bigram, seen context
    s_micro = round(lp_ab * 1e6) + round(lp_bz * 1e6)
    r = out[1]
    assert r["n_bigrams"] == 2
    assert r["sum_logp_micro"] == s_micro
    avg = s_micro / 2 / 1e6
    assert r["avg_logp"] == round(avg, 6)
    assert r["ppl_proxy"] == round(2.0 ** -avg, 6)
    # the unseen bigram must be strictly more surprising than the seen one
    assert lp_bz < lp_ab


def test_ffd_compaction_pack_semantics(spark):
    """operators/compaction.py: FFD ordering, first-fit probing in bin
    creation order, oversized singleton bins, and the distributed
    planner's agreement with the pure-Python reference."""
    from unified_firmographic_data_pipeline_spark.operators.compaction import (
        ffd_pack,
        plan_compaction_bins,
    )

    # sizes 60, 50, 40, 30, 20 with cap 100:
    #   60 -> bin1; 50 -> bin2; 40 -> bin1 (60+40=100); 30 -> bin2 (80);
    #   20 -> bin2 (100)  => bins [(100, 2), (100, 3)]
    sizes = [(1, 60), (2, 50), (3, 40), (4, 30), (5, 20)]
    assert ffd_pack(sizes, cap=100) == [(100, 2), (100, 3)]
    # oversized file gets its own bin, never splits
    assert ffd_pack([(1, 250), (2, 10)], cap=100) == [(250, 1), (10, 1)]
    # size ties probe in id order (deterministic permutation invariance)
    assert ffd_pack([(2, 50), (1, 50), (3, 50)], cap=100) == [(100, 2), (50, 1)]

    rows = [("p1", i, s) for i, s in enumerate([60, 50, 40, 30, 20])] + [
        ("p2", 99, 250),
        ("p2", 100, 10),
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, n_chars long")
    got = {
        (r["source"], r["bin_id"]): (r["bin_bytes"], r["n_files"])
        for r in plan_compaction_bins(df, target_bytes=100).collect()
    }
    assert got == {
        ("p1", 1): (100, 2),
        ("p1", 2): (100, 3),
        ("p2", 1): (250, 1),
        ("p2", 2): (10, 1),
    }


def test_skipgram_pairs_window_and_directions(spark):
    """operators/lm.py:skipgram_pairs on 'a b c d': distance-1 and
    distance-2 neighbors, both directions, correct counts."""
    from unified_firmographic_data_pipeline_spark.operators.lm import skipgram_pairs

    df = spark.createDataFrame([(0, "a b c d")], "doc_id long, text string")
    got = {(r["w"], r["c"]): r["n"] for r in skipgram_pairs(df, window=2).collect()}
    expect = {
        ("a", "b"): 1, ("b", "a"): 1, ("b", "c"): 1, ("c", "b"): 1,
        ("c", "d"): 1, ("d", "c"): 1,              # offset 1
        ("a", "c"): 1, ("c", "a"): 1, ("b", "d"): 1, ("d", "b"): 1,  # offset 2
    }
    assert got == expect

    # symmetry: the (w, c) table must equal its own transpose
    df2 = spark.createDataFrame(
        [(0, "x y x y x")], "doc_id long, text string"
    )
    got2 = {(r["w"], r["c"]): r["n"] for r in skipgram_pairs(df2, window=2).collect()}
    assert all(got2[(a, b)] == got2[(b, a)] for (a, b) in got2)
    # x sits at positions 1/3/5: x-x at distance 2 -> pairs (1,3),(3,5),
    # both directions = 4; y-y at distance 2 -> (2,4) both directions = 2;
    # x-y adjacency -> 4 ordered pairs each way
    assert got2[("x", "x")] == 4
    assert got2[("y", "y")] == 2
    assert got2[("x", "y")] == got2[("y", "x")] == 4


def test_incremental_er_equals_full_batch(spark):
    """plans/entities.py:resolve_entities_incremental — attaching the
    custkey%10==0 increment to the landed entity table must reproduce the
    from-scratch resolve of the union EXACTLY (same stored weights),
    including entity merges bridged by a new record and id relabeling."""
    from pyspark.sql import functions as F

    from unified_firmographic_data_pipeline_spark.plans.entities import (
        candidate_pairs,
        em_match_weights,
        resolve_entities,
        resolve_entities_incremental,
    )

    # sf0.01: at sf0.001 the 15-record increment has no above-threshold
    # pair, which would make the equality vacuous
    c = (
        spark.read.parquet("/root/testdata/sf0.01/customer.parquet")
        .select(
            "c_custkey",
            "c_mktsegment",
            "c_nationkey",
            F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_bucket"),
            (F.col("c_custkey") / 50).cast("long").alias("blk"),
        )
    )
    fields = ["c_mktsegment", "bal_bucket", "c_nationkey"]
    old = c.filter(F.col("c_custkey") % 10 != 0)
    new = c.filter(F.col("c_custkey") % 10 == 0)

    weights = em_match_weights(
        candidate_pairs(old, "c_custkey", "blk", fields), fields
    )
    landed = resolve_entities(
        old, "c_custkey", "blk", fields, threshold_micro=3_000_000,
        weights=weights,
    )
    incr = resolve_entities_incremental(
        old.join(landed, "c_custkey"), new, "c_custkey", "blk", fields,
        weights=weights, threshold_micro=3_000_000,
    )
    full = resolve_entities(
        c, "c_custkey", "blk", fields, threshold_micro=3_000_000,
        weights=weights,
    )
    a = {r["c_custkey"]: r["entity_id"] for r in incr.collect()}
    b = {r["c_custkey"]: r["entity_id"] for r in full.collect()}
    assert a == b
    # non-vacuous: some new record shares an entity with another record
    # (either it attached to an existing entity, or it became the min-id
    # representative and pulled old members onto its label)
    from collections import Counter

    ent_sizes = Counter(a.values())
    touched = [
        k for k in a if k % 10 == 0 and ent_sizes[a[k]] > 1
    ]
    assert touched, "increment produced no matches - test data too sparse"


def test_survivorship_null_semantics(spark):
    """NULL never wins a mode vote even when modal; all-NULL entities
    survive NULL through the left join instead of dropping."""
    from unified_firmographic_data_pipeline_spark.plans.entities import (
        survivorship,
    )

    recs = spark.createDataFrame(
        [
            (1, None, 10.0), (2, None, 20.0), (3, "A", 5.0),   # entity 1
            (4, None, 1.0), (5, None, 2.0),                     # entity 4: all NULL
        ],
        "id long, seg string, bal double",
    )
    asg = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4)], "id long, entity_id long"
    )
    out = {
        r["entity_id"]: r
        for r in survivorship(
            recs, asg, "id", mode_cols=["seg"], max_cols=["bal"]
        ).collect()
    }
    assert out[1]["seg_survived"] == "A"     # NULL was modal but never wins
    assert out[1]["bal_survived"] == 20.0
    assert out[4]["seg_survived"] is None    # all-NULL entity not dropped
    assert out[4]["n_members"] == 2

"""Round-8 batch-46 operator tests: n-gram novelty decay, dataset-card
discrete percentiles, temperature mix plan (largest remainder), and the
lexicon blocklist audit — each against a pure-Python brute force."""

from __future__ import annotations

import math

from unified_firmographic_data_pipeline_spark.operators.corpusstats import (
    dataset_card_stats,
    ngram_novelty_decay,
)
from unified_firmographic_data_pipeline_spark.operators.mixing import (
    lexicon_flag_stats,
    temperature_mix_plan,
)

import pytest

# heavy property sweep / e2e tier (see pytest.ini): excluded from the
# default driver-window run, executed by the full tier at close-out
pytestmark = pytest.mark.slow


DOCS = [
    (0, "a b c d e", "s0"),
    (1, "a b c d e", "s0"),          # exact dup of doc 0 -> zero novelty
    (2, "x y z w v u", "s0"),
    (3, "a b c q r", "s1"),          # shares the 'a b c' gram with doc 0
    (4, "mm nn", "s1"),              # <3 tokens -> whole-text shingle
    (5, "fresh words only here now", "s1"),
    (6, "x y z w v u", "s2"),        # dup of 2
    (7, "totally new stuff appears finally", "s2"),
    (8, "a b c d e extra", "s2"),
    (9, "last doc ends the corpus", "s2"),
]


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, source string")


def _grams(text):
    t = text.split()
    if len(t) < 3:
        return {text}
    return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}


def test_ngram_novelty_matches_bruteforce(spark):
    out = {
        r["bucket"]: (r["n_doc_grams"], r["n_novel"], r["novelty_rate"])
        for r in ngram_novelty_decay(_docs_df(spark), n_buckets=10).collect()
    }
    first = {}
    for did, text, _ in DOCS:
        for g in _grams(text):
            first.setdefault(g, did)
    mx = max(d for d, _, _ in DOCS) + 1
    exp = {}
    for did, text, _ in DOCS:
        b = did * 10 // mx
        gs = _grams(text)
        tot, nov = exp.get(b, (0, 0))
        exp[b] = (
            tot + len(gs),
            nov + sum(1 for g in gs if first[g] == did),
        )
    for b, (tot, nov) in exp.items():
        assert out[b][:2] == (tot, nov), f"bucket {b}"
        assert out[b][2] == round(nov / tot, 6)
    # doc 1 (exact dup) contributes zero novel grams to its bucket
    assert out[1] == (3, 0, 0.0)


def test_dataset_card_discrete_percentiles(spark):
    out = {r["source"]: r.asDict() for r in dataset_card_stats(_docs_df(spark)).collect()}
    for src in ("s0", "s1", "s2"):
        toks = sorted(len(t.split()) for d, t, s in DOCS if s == src)
        n = len(toks)
        p50 = toks[math.ceil(0.5 * n) - 1]
        p90 = toks[math.ceil(0.9 * n) - 1]
        row = out[src]
        assert row["n_docs"] == n
        assert row["total_tokens"] == sum(toks)
        assert row["p50_tokens"] == p50, src
        assert row["p90_tokens"] == p90, src
        assert row["mean_tokens"] == round(sum(toks) / n, 6)


def test_temperature_mix_plan_largest_remainder_exact(spark):
    budget = 1000
    out = {
        r["source"]: r.asDict()
        for r in temperature_mix_plan(
            _docs_df(spark), alpha=0.7, budget=budget
        ).collect()
    }
    n_tok = {}
    for _, t, s in DOCS:
        n_tok[s] = n_tok.get(s, 0) + len(t.split())
    w = {s: round(n**0.7 * 1e6) for s, n in n_tok.items()}
    tw = sum(w.values())
    base = {s: (wi * budget) // tw for s, wi in w.items()}
    rem = {s: (wi * budget) % tw for s, wi in w.items()}
    leftover = budget - sum(base.values())
    order = sorted(w, key=lambda s: (-rem[s], s))
    exp = {
        s: base[s] + (1 if order.index(s) < leftover else 0) for s in w
    }
    assert sum(r["quota_tokens"] for r in out.values()) == budget
    for s in w:
        assert out[s]["n_tokens"] == n_tok[s]
        assert out[s]["weight_micro"] == w[s]
        assert out[s]["quota_tokens"] == exp[s], s


def test_temperature_alpha_one_is_proportional(spark):
    """alpha=1 must reduce to plain proportional allocation."""
    out = {
        r["source"]: r["quota_tokens"]
        for r in temperature_mix_plan(
            _docs_df(spark), alpha=1.0, budget=10_000
        ).collect()
    }
    n_tok = {}
    for _, t, s in DOCS:
        n_tok[s] = n_tok.get(s, 0) + len(t.split())
    total = sum(n_tok.values())
    for s, q in out.items():
        assert abs(q - 10_000 * n_tok[s] / total) <= 1, s


def test_lexicon_flag_stats_bruteforce(spark):
    terms = ["a", "fresh"]
    out = {
        r["source"]: r.asDict()
        for r in lexicon_flag_stats(_docs_df(spark), terms).collect()
    }
    for src in ("s0", "s1", "s2"):
        docs = [t for d, t, s in DOCS if s == src]
        hits = [sum(1 for tk in t.split() if tk.lower() in terms) for t in docs]
        row = out[src]
        assert row["n_docs"] == len(docs)
        assert row["n_flagged"] == sum(1 for h in hits if h > 0)
        assert row["total_hits"] == sum(hits)
        assert row["flag_rate"] == round(row["n_flagged"] / len(docs), 6)


def test_epoch_allocation_plan_bruteforce(spark):
    from unified_firmographic_data_pipeline_spark.operators.mixing import (
        epoch_allocation_plan,
    )

    docs = DOCS + [(10, "a b c d e", "s1")]  # cross-source dup of doc 0
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    out = {
        r["source"]: r.asDict()
        for r in epoch_allocation_plan(
            df, alpha=0.7, target_epochs=2, max_epochs=2
        ).collect()
    }
    # brute force: dedup keeps lowest doc_id per normalized-lower text
    seen, kept = {}, []
    for did, text, src in sorted(docs):
        fpk = " ".join(text.lower().split())
        if fpk not in seen:
            seen[fpk] = did
            kept.append((did, text, src))
    u = {}
    for _, text, src in kept:
        u[src] = u.get(src, 0) + len(text.split())
    w = {s: round(n**0.7 * 1e6) for s, n in u.items()}
    tw, b = sum(w.values()), 2 * sum(u.values())
    for s in u:
        base = (b * w[s]) // tw
        quota = min(base, 2 * u[s])
        row = out[s]
        assert row["unique_tokens"] == u[s], s
        assert row["weight_micro"] == w[s], s
        assert row["base_quota"] == base, s
        assert row["quota_tokens"] == quota, s
        assert row["is_capped"] == (base > 2 * u[s]), s
        assert row["epochs_micro"] == (quota * 1_000_000) // u[s], s
    # the duplicate doc 10 must not count toward s1's unique tokens
    assert out["s1"]["unique_tokens"] == sum(
        len(t.split()) for d, t, s in DOCS if s == "s1"
    )


def test_stream_exact_dedup_sink_matches_batch(spark, tmp_path):
    """Landed survivors == batch dedup_exact after EVERY micro-batch, for
    out-of-order arrivals (a late lower id evicts the earlier survivor)
    and across checkpoint replays."""
    from unified_firmographic_data_pipeline_spark.operators.dedup import dedup_exact
    from unified_firmographic_data_pipeline_spark.streaming.ingest import (
        stream_exact_dedup_sink,
    )

    rows = [
        (5, "the same text", "a"),
        (6, "other text", "a"),
        (7, "the same text", "b"),   # dup of 5
        (0, "the  SAME   text", "c"),  # NORMALIZED dup of 5, LOWER id
        (1, "third text", "c"),
        (2, "other text", "d"),      # dup of 6, lower id
    ]
    batches = [rows[:3], rows[3:5], rows[5:]]
    sch = "doc_id long, text string, source string"
    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")

    def run():
        q = stream_exact_dedup_sink(
            spark.readStream.schema(sch).parquet(src), table, ckpt,
            content_col="text", id_col="doc_id",
        )
        q.awaitTermination()

    ingested = []
    for batch in batches:
        ingested.extend(batch)
        spark.createDataFrame(batch, sch).coalesce(1).write.mode("append").parquet(src)
        run()
        landed = {
            tuple(r) for r in spark.read.parquet(table).drop("__fp").collect()
        }
        expected = {
            tuple(r)
            for r in dedup_exact(
                spark.createDataFrame(ingested, sch), "text", "doc_id"
            ).collect()
        }
        assert landed == expected, f"after {len(ingested)} rows"
    # survivor set: lowest id per normalized content
    assert {r[0] for r in landed} == {0, 1, 2}
    # replay with the same checkpoint: no change
    run()
    assert {
        tuple(r) for r in spark.read.parquet(table).drop("__fp").collect()
    } == landed


def test_json_key_drift_bruteforce(spark):
    from unified_firmographic_data_pipeline_spark.quality.drift import json_key_drift

    before = spark.createDataFrame(
        [('{"k": 1, "legacy": 2}',), ('{"k": 3}',)], "p string"
    )
    after = spark.createDataFrame(
        [('{"k": 4, "v2": 5}',), ('{"k": 6}',), ('{"renamed": 7}',)], "p string"
    )
    out = {r["key"]: r.asDict() for r in json_key_drift(before, after, "p").collect()}
    assert out["legacy"]["status"] == "removed"
    assert out["v2"]["status"] == "added" and out["renamed"]["status"] == "added"
    assert out["k"]["status"] == "stable"
    assert (out["k"]["before_n"], out["k"]["after_n"]) == (2, 2)
    # k: 2/2 rows before -> 2/3 rows after
    assert out["k"]["rate_delta_micro"] == round(2 / 3 * 1e6) - 1_000_000
    assert out["legacy"]["rate_delta_micro"] == -500_000
    assert out["v2"]["rate_delta_micro"] == round(1 / 3 * 1e6)

def test_additive_state_fold_exactly_once(spark, tmp_path):
    """Per-key sums equal the full-input groupBy after every fold; a
    REPLAYED batch_id is a no-op (the applied-batch ledger — additive
    state is the one fold shape idempotence doesn't cover)."""
    from unified_firmographic_data_pipeline_spark.streaming.ingest import (
        additive_state_fold,
    )

    table = str(tmp_path / "state")
    sch = "k string, v long"
    batches = [
        [("a", 1), ("b", 2), ("a", 3)],
        [("b", 4), ("c", 5)],
        [("a", 6)],
    ]
    seen = []
    for bid, rows in enumerate(batches):
        seen.extend(rows)
        assert additive_state_fold(
            spark.createDataFrame(rows, sch), bid, table, ["k"], "v"
        )
        landed = {
            r["k"]: r["total"]
            for r in spark.read.parquet(table).filter("kind = 'state'").collect()
        }
        exp = {}
        for k, v in seen:
            exp[k] = exp.get(k, 0) + v
        assert landed == exp, f"after batch {bid}"
    # replaying batch 1 must be a no-op, not a double-add
    assert not additive_state_fold(
        spark.createDataFrame(batches[1], sch), 1, table, ["k"], "v"
    )
    landed2 = {
        r["k"]: r["total"]
        for r in spark.read.parquet(table).filter("kind = 'state'").collect()
    }
    assert landed2 == exp
    # the ledger carries exactly the applied ids
    ids = sorted(
        r["batch_id"]
        for r in spark.read.parquet(table).filter("kind = 'batch'").collect()
    )
    assert ids == [0, 1, 2]


def test_stream_additive_state_sink_counts(spark, tmp_path):
    from unified_firmographic_data_pipeline_spark.streaming.ingest import (
        stream_additive_state_sink,
    )

    sch = "k string, v long"
    src = str(tmp_path / "src")
    table = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    rows = [("x", 10), ("y", 1), ("x", 5)]

    def run():
        q = stream_additive_state_sink(
            spark.readStream.schema(sch).parquet(src), table, ckpt, ["k"], "v"
        )
        q.awaitTermination()

    spark.createDataFrame(rows[:2], sch).coalesce(1).write.mode("append").parquet(src)
    run()
    spark.createDataFrame(rows[2:], sch).coalesce(1).write.mode("append").parquet(src)
    run()
    landed = {
        r["k"]: r["total"]
        for r in spark.read.parquet(table).filter("kind = 'state'").collect()
    }
    assert landed == {"x": 15, "y": 1}
    run()  # replay with the same checkpoint: unchanged
    landed2 = {
        r["k"]: r["total"]
        for r in spark.read.parquet(table).filter("kind = 'state'").collect()
    }
    assert landed2 == landed

def test_bcubed_scores_bruteforce(spark):
    """B-cubed P/R/F1 against a direct per-record computation on a
    fixture with a split cluster (recall loss) and a merged cluster
    (precision loss)."""
    from unified_firmographic_data_pipeline_spark.operators.linkage import bcubed_scores

    #        record: (pred cluster, truth class)
    assign = [
        ("p1", "t1"), ("p1", "t1"),        # correct 2-cluster
        ("p2", "t2"), ("p3", "t2"),        # truth t2 SPLIT across p2/p3
        ("p4", "t3"), ("p4", "t4"),        # preds MERGED across t3/t4
        ("p5", "t5"),                       # singleton
    ]
    df = spark.createDataFrame(assign, "pred string, truth string")
    row = bcubed_scores(df, "pred", "truth").collect()[0]
    n = len(assign)
    from collections import Counter
    cellс = Counter(assign)
    pc = Counter(p for p, _ in assign)
    tc = Counter(t for _, t in assign)
    prec = sum(cellс[(p, t)] ** 2 / pc[p] for p, t in cellс) / n
    rec = sum(cellс[(p, t)] ** 2 / tc[t] for p, t in cellс) / n
    assert row["n_records"] == n
    assert row["n_pred_clusters"] == len(pc) and row["n_truth_classes"] == len(tc)
    assert abs(row["b3_precision"] - prec) < 1e-6
    assert abs(row["b3_recall"] - rec) < 1e-6
    assert abs(row["b3_f1"] - 2 * prec * rec / (prec + rec)) < 1e-6
    # sanity: this fixture loses BOTH precision (merge) and recall (split)
    assert row["b3_precision"] < 1.0 and row["b3_recall"] < 1.0

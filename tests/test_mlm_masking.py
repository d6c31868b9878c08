"""BERT-style MLM masking plan (operators/lm.py:mlm_masking_plan)."""

from __future__ import annotations

import hashlib

from unified_firmographic_data_pipeline_spark.operators.lm import mlm_masking_plan


def _u(salt: str, doc_id: int, pos: int) -> float:
    h = hashlib.md5(f"{salt}{doc_id}:{pos}".encode()).hexdigest()
    return int(h[:13], 16) / 16**13


def test_mlm_plan_replays_in_python(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j % 17}" for j in range(i, i + 40))) for i in range(12)],
        "doc_id long, text string",
    )
    out = {
        (r["doc_id"], r["pos"]): (r["token"], r["action"], r["replacement"])
        for r in mlm_masking_plan(docs).collect()
    }
    # vocabulary: distinct tokens sorted (row_number over ORDER BY token)
    vocab = sorted({f"w{j % 17}" for i in range(12) for j in range(i, i + 40)})
    nv = len(vocab)
    expected = {}
    for i in range(12):
        toks = [f"w{j % 17}" for j in range(i, i + 40)]
        for pos, tok in enumerate(toks):
            if _u("mlm", i, pos) >= 0.15:
                continue
            ua, ut = _u("act", i, pos), _u("tok", i, pos)
            action = "mask" if ua < 0.8 else ("random" if ua < 0.9 else "keep")
            vid = min(int(ut * nv), nv - 1)
            repl = {"mask": "[MASK]", "random": vocab[vid], "keep": tok}[action]
            expected[(i, pos)] = (tok, action, repl)
    assert out == expected
    # sanity: selection rate in a plausible band and all actions present
    assert 0.05 < len(out) / (12 * 40) < 0.30
    assert {a for _, a, _ in out.values()} <= {"mask", "random", "keep"}
    assert any(a == "mask" for _, a, _ in out.values())


def test_mlm_plan_is_deterministic_across_runs(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta " * 20)], "doc_id long, text string"
    )
    a = sorted(map(tuple, mlm_masking_plan(docs).collect()))
    b = sorted(map(tuple, mlm_masking_plan(docs).collect()))
    assert a == b


def test_mlm_probabilities_partition_actions(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(f"t{j}" for j in range(60))) for i in range(30)],
        "doc_id long, text string",
    )
    rows = mlm_masking_plan(docs, select_p=1.0).collect()
    assert len(rows) == 30 * 60  # select_p=1 keeps every position
    masks = sum(r["action"] == "mask" for r in rows)
    randoms = sum(r["action"] == "random" for r in rows)
    keeps = sum(r["action"] == "keep" for r in rows)
    assert masks + randoms + keeps == len(rows)
    assert masks > randoms > 0 and keeps > 0
    for r in rows:
        if r["action"] == "keep":
            assert r["replacement"] == r["token"]
        elif r["action"] == "mask":
            assert r["replacement"] == "[MASK]"

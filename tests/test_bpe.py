"""Iterative BPE learner vs a pure-Python reference implementation.

The reference is the textbook Sennrich et al. 2016 algorithm (word-freq
table, frequency-weighted adjacent pair counts, greedy left-to-right
merge, count-desc/pair-lex tiebreak) — the Spark learner must reproduce
its merge SEQUENCE exactly and re-segment training words identically.
"""

from __future__ import annotations

import collections

import pytest

from unified_firmographic_data_pipeline_spark.operators.bpe import (
    EOW,
    bpe_learn,
    bpe_segment,
    word_freq_symbols,
)


def ref_word_freqs(texts: list[str]) -> dict[tuple[str, ...], int]:
    wf: collections.Counter = collections.Counter()
    for t in texts:
        for w in " ".join(t.split()).split(" "):
            syms = list(w)
            if syms:
                syms[-1] = syms[-1] + EOW
            wf[tuple(syms)] += 1
    return dict(wf)


def ref_merge_seq(texts: list[str], n_merges: int):
    """Reference BPE: returns (merges, final symbol table)."""
    wf = ref_word_freqs(texts)
    merges = []
    for _ in range(n_merges):
        pairs: collections.Counter = collections.Counter()
        for syms, freq in wf.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += freq
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (a, b), n = best
        if n < 2:
            break
        merges.append((a, b, n))
        new_wf = {}
        for syms, freq in wf.items():
            out = []
            for x in syms:  # greedy left-to-right, same fold as Spark
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            new_wf[tuple(out)] = new_wf.get(tuple(out), 0) + freq
        wf = new_wf
    return merges, wf


TEXTS = [
    "the cat sat on the mat",
    "the cats sat on the mats",
    "low lower lowest slow slower",
    "new newer newest renew",
    "a ab abc abcd",
    "",  # degenerate: empty doc
    "x",  # 1-char doc
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string")


def test_word_freq_symbols(spark, corpus):
    rows = {r["word"]: (r["freq"], r["syms"]) for r in word_freq_symbols(corpus).collect()}
    assert rows["the"][0] == 4
    assert rows["the"][1] == ["t", "h", "e" + EOW]
    assert rows["x"][1] == ["x" + EOW]


def test_merge_sequence_matches_reference(spark, corpus):
    ref_merges, _ = ref_merge_seq(TEXTS, 12)
    got_merges, vocab = bpe_learn(corpus, 12)
    assert got_merges == ref_merges
    # final segmentation matches the reference symbol table, word by word
    ref_wf = {}
    for syms, freq in ref_merge_seq(TEXTS, 12)[1].items():
        word = "".join(syms).replace(EOW, "")
        ref_wf[word] = list(syms)
    got = {r["word"]: r["syms"] for r in vocab.collect()}
    assert got == {w: s for w, s in ref_wf.items()}


def test_segment_roundtrips_training_words(spark, corpus):
    merges, vocab = bpe_learn(corpus, 8)
    words = spark.createDataFrame([("lowest",), ("renew",), ("cats",)], "word string")
    seg = {r["word"]: r["bpe_tokens"] for r in bpe_segment(words, merges).collect()}
    train = {r["word"]: r["syms"] for r in vocab.collect()}
    for w, toks in seg.items():
        assert toks == train[w], (w, toks, train[w])
        assert "".join(toks).replace(EOW, "") == w  # lossless


def test_early_stop_on_hapax_pairs(spark):
    df = spark.createDataFrame([(0, "qq zz")], "doc_id long, text string")
    merges, _ = bpe_learn(df, 10)
    # 'qq'/'zz' pairs occur once each per word... q+q appears once (freq 1)
    # -> below the n>=2 floor after the initial merges exhaust
    for _, _, n in merges:
        assert n >= 2

"""Iterative byte-pair-encoding vocabulary induction + segmentation.

Extends the single-iteration ``bpe_first_merge`` driver query into the
full Sennrich et al. 2016 training loop (public algorithm; reference
analogue: the tokenizer-prep step any LLM-data pipeline runs before
token-count accounting — the reference itself has no tokenizer, its
text handling stops at string cleaning, ``stg_*.sql``).

Scale design (100 TB): the corpus is scanned ONCE to build the
word-frequency table; every subsequent iteration works on that
VOCABULARY-sized frame (tens of thousands of rows at any corpus size —
Heaps' law, measured in `heaps_zipf_corpus_stats`), so n_merges
iterations cost n_merges small vocab aggregates, not n corpus scans.
Each iteration is:

- pair counts: one explode + sum over the vocab frame (map-side
  combinable; pair space is bounded by total symbol length);
- argmax: a 1-row ``collect()`` (bounded scalar, the sanctioned driver
  data path — same contract as k-means centroids);
- merge application: a branch-free ``aggregate`` fold per symbol array
  (greedy left-to-right, matching the reference algorithm), then
  ``localCheckpoint`` every few rounds to truncate the growing lineage
  (the k-means/pagerank iteration pattern).

Determinism: ties on pair count break lexicographically on the pair
string, so the merge SEQUENCE is reproducible across engines and runs —
pinned in tests against a pure-Python reference implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: end-of-word sentinel (Sennrich's </w>): lets the learner distinguish
#: word-final from word-internal symbols; kept single-char so symbol
#: arrays stay compact.
EOW = "␗"  # ␗ SYMBOL FOR END OF TRANSMISSION BLOCK — not in corpus text


def word_freq_symbols(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One corpus scan -> the (word, freq, syms) vocabulary frame: words
    are whitespace tokens, ``syms`` the character split with the
    end-of-word sentinel appended to the final character."""
    from unified_firmographic_data_pipeline_spark.functions.text import tokens

    wf = (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    return wf.select("word", "freq", _char_syms("word").alias("syms"))


def _char_syms(word_col: str):
    """Character split with the EOW sentinel appended to the final char.
    ``split(w, '')`` keeps a trailing empty string (Java split semantics
    with limit -1), so empties are filtered before indexing."""
    return F.expr(
        f"transform(filter(split({word_col}, ''), c -> c <> ''),"
        f" (c, i) -> IF(i = length({word_col}) - 1, c || '{EOW}', c))"
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Frequency-weighted adjacent-symbol pair counts over the vocab
    frame. sequence(1, 0) guard: 1-symbol words contribute nothing."""
    pairs = vocab.select(
        "freq",
        F.explode(
            F.expr(
                "CASE WHEN size(syms) >= 2 THEN"
                " transform(sequence(1, size(syms) - 1),"
                " i -> struct(syms[i - 1] AS a, syms[i] AS b))"
                " ELSE array() END"
            )
        ).alias("p"),
    )
    return pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b")).agg(
        F.sum("freq").cast("long").alias("n")
    )


def _apply_merge(vocab: DataFrame, a: str, b: str) -> DataFrame:
    """Replace every adjacent (a, b) in each symbol array with the merged
    symbol, greedily left-to-right (so 'aaa' under merge (a,a) becomes
    ['aa','a'], like the reference algorithm). Branch-lazy CASE keeps
    element_at off empty accumulators under ANSI mode."""
    la, lb = F.lit(a), F.lit(b)
    merged = F.aggregate(
        F.col("syms"),
        F.array().cast("array<string>"),
        # ordered WHEN branches (not one AND chain): CaseWhen evaluates
        # conditions strictly in order and lazily, so element_at never
        # sees an empty accumulator under ANSI mode
        lambda acc, x: F.when(F.size(acc) == 0, F.array(x))
        .when(
            (F.element_at(acc, -1) == la) & (x == lb),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.concat(la, lb))
            ),
        )
        .otherwise(F.concat(acc, F.array(x))),
    )
    return vocab.withColumn("syms", merged)


def bpe_learn(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    checkpoint_every: int = 4,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges from the corpus.

    Returns ``(merges, vocab)``: the ordered merge list as
    ``(left, right, pair_count)`` tuples, and the final vocabulary frame
    ``(word, freq, syms)`` with all merges applied. Stops early when no
    pair occurs at least twice (merging hapax pairs is noise).
    """
    vocab = word_freq_symbols(df, text_col).localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    for it in range(n_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(F.col("n").desc(), F.col("a"), F.col("b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < 2:
            break
        a, b, n = top[0]["a"], top[0]["b"], top[0]["n"]
        merges.append((a, b, n))
        vocab = _apply_merge(vocab, a, b)
        if (it + 1) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint(eager=True)
    return merges, vocab


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    word_col: str = "word",
    out_col: str = "bpe_tokens",
    checkpoint_every: int = 8,
) -> DataFrame:
    """Segment words with a learned merge list: char-split + sentinel,
    then apply each merge in order (same greedy fold as training, so a
    training word always re-segments to its training symbols). The fold
    chain is cut with ``localCheckpoint`` every ``checkpoint_every``
    merges to keep the expression tree bounded."""
    out = df.withColumn("syms", _char_syms(word_col))
    for i, m in enumerate(merges):
        out = _apply_merge(out, m[0], m[1])
        if (i + 1) % checkpoint_every == 0:
            out = out.localCheckpoint(eager=True)
    return out.withColumnRenamed("syms", out_col)

"""WordPiece-style greedy subword segmentation (Wu et al. 2016, GNMT;
the tokenizer-apply step of the BERT family — the learner's analogue here
is operators/bpe.py).

Segmentation = greedy longest-match-first against a fixed vocabulary,
with a single-character fallback so no word is unencodable (instead of an
UNK token — the bounded-vocab contract a data pipeline wants when it
counts subword budgets). Deterministic end to end:

- the vocabulary is the top-``top_words`` corpus tokens by
  (count DESC, token ASC) — a bounded collect (the PAV/codebook
  contract);
- the greedy match is a pure function of (word, vocab): at each position
  take the LONGEST vocab piece (<= ``max_piece_len``) that prefixes the
  remainder, else consume one character.

Scale shape: segmentation runs once per DISTINCT word (the distinct
projection shuffles short tokens, never documents), Arrow-batched in a
pandas UDF over a plain Python set — the vocabulary is a few hundred
strings, so the per-word loop is dict-lookup bound, and corpus-frequency
weighting re-joins on the token key afterwards. A DuckDB recursive CTE
replays the greedy walk exactly (one state row per (word, position))."""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import IntegerType

from unified_firmographic_data_pipeline_spark.functions.text import tokens


def wordpiece_vocab(
    docs: DataFrame, text_col: str = "text", top_words: int = 200
) -> list[str]:
    """Top-``top_words`` corpus tokens by (count DESC, token ASC) — the
    deterministic whole-word tier of the vocabulary. Bounded collect."""
    counts = (
        docs.select(F.explode(tokens(text_col)).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("w").asc())
        .limit(top_words)
        .collect()
    )
    return [r["w"] for r in counts]


def greedy_piece_count(word: str, vocab: set, max_piece_len: int = 8) -> int:
    """Number of pieces greedy longest-match-first segmentation emits for
    ``word``: longest vocab prefix of the remainder (up to
    ``max_piece_len`` chars), single-character fallback otherwise."""
    pos, n = 0, 0
    ln = len(word)
    while pos < ln:
        step = 1
        for piece_len in range(min(max_piece_len, ln - pos), 1, -1):
            if word[pos : pos + piece_len] in vocab:
                step = piece_len
                break
        pos += step
        n += 1
    return n


def wordpiece_piece_counts(
    words: DataFrame,
    vocab: list[str],
    word_col: str = "word",
    max_piece_len: int = 8,
) -> DataFrame:
    """(word, n_pieces) for each input row — Arrow-batched greedy
    segmentation against the broadcast vocabulary set. Feed DISTINCT
    words; weight by corpus frequency with a join afterwards."""
    vocab_set = set(vocab)

    @F.pandas_udf(IntegerType())
    def _n_pieces(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            yield s.map(
                lambda w: greedy_piece_count(w, vocab_set, max_piece_len)
                if w
                else None
            ).astype("Int32")

    return words.withColumn("n_pieces", _n_pieces(F.col(word_col)))

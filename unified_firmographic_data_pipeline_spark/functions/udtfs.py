"""Python UDTFs (table functions) — the LATERAL-join tier for Python logic
that yields multiple rows per input (SURVEY.md §2.C C3 is the builtin
explode; this is the extensibility path for row-expanding logic no
expression covers, e.g. sentence segmentation ahead of per-sentence
dedup/quality in a training-data pipeline).

Arrow-batched by the engine session defaults; logic stays per-row only
inside the already-batched eval loop.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

_SENT_BOUNDARY = re.compile(r"(?<=[.!?])\s+")


@udtf(returnType="sent_idx int, sentence string, n_chars int")
class SplitSentences:
    """One output row per sentence of the input text (deterministic
    punctuation-boundary rule; a real deployment would swap a model-based
    segmenter behind the same row contract)."""

    def eval(self, text: str | None):
        if not text:
            return
        for i, s in enumerate(p for p in _SENT_BOUNDARY.split(text) if p.strip()):
            yield i, s, len(s)


def register_udtfs(spark) -> None:
    """Register all engine UDTFs for SQL use (LATERAL split_sentences(...))."""
    spark.udtf.register("split_sentences", SplitSentences)

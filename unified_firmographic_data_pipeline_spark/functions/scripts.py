"""Unicode-script and encoding-sanity profiling for multilingual corpora.

The stopword language detector (``functions.text.detect_lang``) only
covers Latin-script languages; at corpus scale the FIRST routing decision
is coarser — which writing system is this document, and is its encoding
even intact? Two expression-only signal families:

- :func:`script_counts` / :func:`dominant_script`: per-document character
  counts for the major Unicode script blocks (regexp over literal
  codepoint ranges — pure JVM expressions, no UDF) and the argmax script
  with deterministic ties, the standard router in multilingual pipeline
  stacks (cf. the fastText/CLD-family preprocessing steps).
- :func:`mojibake_score` / :func:`replacement_char_ratio`: double-encoded
  UTF-8 leaves characteristic ``Ã``/``â€``-class digraphs (a UTF-8 byte
  sequence re-decoded as Latin-1), and lossy transcodes leave U+FFFD —
  cheap, high-precision signals for the encoding-corruption bucket every
  web-scale corpus has.

All pure ``Column -> Column`` expressions (SURVEY §2.L policy: builtin >
pandas_udf > never row-UDF), trivially oracle-able: the same codepoint
ranges are valid RE2 classes for the DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: major script blocks as (name, regex character class) — BMP ranges only,
#: which is what web text overwhelmingly is; anything else lands in
#: "other". Ordered: ties in dominant_script break toward the EARLIER
#: entry via the greatest(struct) trick's name ordering, so keep this
#: list alphabetical by design.
SCRIPT_RANGES: tuple[tuple[str, str], ...] = (
    ("arabic", "؀-ۿݐ-ݿ"),
    ("cjk", "一-鿿㐀-䶿"),
    ("cyrillic", "Ѐ-ӿ"),
    ("devanagari", "ऀ-ॿ"),
    ("greek", "Ͱ-Ͽ"),
    ("hangul", "가-힯ᄀ-ᇿ"),
    ("hebrew", "֐-׿"),
    ("kana", "぀-ヿ"),
    ("latin", "A-Za-zÀ-ɏ"),
    ("thai", "฀-๿"),
)


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def script_count(c: Column | str, ranges: str) -> Column:
    """Number of characters of ``c`` inside the codepoint class ``ranges``
    — length minus the length with those characters removed (one
    regexp_replace, no explode)."""
    c = _col(c)
    return (
        F.length(c) - F.length(F.regexp_replace(c, f"[{ranges}]", ""))
    ).cast("long")


def script_counts(c: Column | str) -> dict[str, Column]:
    """name -> per-document character count for every block in
    :data:`SCRIPT_RANGES`."""
    return {name: script_count(c, rng) for name, rng in SCRIPT_RANGES}


def dominant_script(c: Column | str, min_chars: int = 1) -> Column:
    """The script with the most characters in the document, ``'und'``
    when no block reaches ``min_chars``, NULL on NULL text. Ties break
    toward the alphabetically-FIRST script name (deterministic: max over
    (count, reversed-name) structs — the ``detect_lang`` device)."""
    c = _col(c)
    counts = script_counts(c)
    pairs = [
        F.struct(cnt.alias("n"), F.lit(name).alias("script"))
        for name, cnt in sorted(counts.items(), reverse=True)
    ]
    best = F.greatest(*pairs)
    return F.when(c.isNull(), F.lit(None).cast("string")).when(
        best["n"] >= min_chars, best["script"]
    ).otherwise(F.lit("und"))


#: the classic double-encoding digraph heads: a UTF-8 lead byte 0xC2-0xC3
#: (Ã, Â), 0xE2 mis-decoded as â followed by Latin-1 punctuation (â€ is
#: the ubiquitous smart-quote wreck), plus the windows-1252 round-trip
#: artifacts Ã‚/Ã¢. High precision on real web text: these digraphs are
#: vanishingly rare in CLEAN text of any language.
_MOJIBAKE_PATTERN = "(Ã.|Â.|â€.)"


def mojibake_hits(c: Column | str) -> Column:
    """Count of double-encoding artifact digraphs in the document."""
    return F.size(F.regexp_extract_all(_col(c), F.lit(_MOJIBAKE_PATTERN), 0)).cast(
        "long"
    )


def replacement_char_ratio(c: Column | str) -> Column:
    """Fraction of characters that are U+FFFD (the lossy-transcode
    tombstone); NULL on empty/NULL text."""
    c = _col(c)
    n = F.length(c)
    hits = n - F.length(F.regexp_replace(c, "�", ""))
    return F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(
        F.lit(None).cast("double")
    )


def mojibake_score(c: Column | str) -> Column:
    """Artifact digraphs per 100 characters (0.0 for clean docs, NULL on
    empty/NULL text) — the bucketable encoding-corruption intensity."""
    c = _col(c)
    n = F.length(c)
    return F.when(
        n > 0, F.round(mojibake_hits(c).cast("double") * 100.0 / n.cast("double"), 6)
    ).otherwise(F.lit(None).cast("double"))

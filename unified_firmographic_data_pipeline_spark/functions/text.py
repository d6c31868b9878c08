"""Text-analysis expressions for the LLM-data-pipeline extensions.

All pure Catalyst expressions (no UDFs): tokenization, token statistics,
quality ratios, language-ID scoring, and document fingerprinting over the
``documents`` table (SURVEY.md §2.M). Designed for 100 TB: every function is
a per-row expression — embarrassingly parallel, whole-stage-codegen'd, no
shuffle implied.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def collapse_ws(c: Column | str) -> Column:
    """Normalize whitespace runs to single spaces and trim."""
    return F.trim(F.regexp_replace(_col(c), r"\s+", " "))


def tokens(c: Column | str) -> Column:
    """Whitespace tokenization -> ArrayType(StringType)."""
    return F.split(collapse_ws(c), " ")


def token_count(c: Column | str) -> Column:
    """Number of whitespace tokens (0 for empty strings)."""
    t = collapse_ws(c)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, " ")))


#: words, digit runs, single punctuation — shared by both token-count tiers
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"


def bpe_ish_token_count(c: Column | str) -> Column:
    """Sub-word-ish token count: words, digit runs, and punctuation each
    count as one token — a cheap deterministic proxy for a BPE tokenizer
    (word-count-based estimates undercount code/punctuation-heavy text)."""
    return F.size(F.regexp_extract_all(_col(c), F.lit(BPE_ISH_PATTERN), 0))


def stopword_count(c: Column | str, stopwords: Sequence[str]) -> Column:
    """How many tokens are in ``stopwords`` (exact, case-sensitive)."""
    arr = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(tokens(c), lambda t: F.array_contains(arr, t)))


def stopword_ratio(c: Column | str, stopwords: Sequence[str]) -> Column:
    """stopword tokens / all tokens (NULL when no tokens)."""
    n = token_count(c)
    return F.when(n == 0, F.lit(None).cast("double")).otherwise(
        stopword_count(c, stopwords).cast("double") / n.cast("double")
    )


def punct_ratio(c: Column | str) -> Column:
    """Punctuation characters / total characters (NULL for empty)."""
    c = _col(c)
    n = F.length(c)
    npunct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return F.when(n == 0, F.lit(None).cast("double")).otherwise(
        npunct.cast("double") / n.cast("double")
    )


def doc_fingerprint(c: Column | str) -> Column:
    """Deterministic content fingerprint: md5 of lowercased,
    whitespace-normalized text. The exact-dedup key."""
    return F.md5(F.lower(collapse_ws(c)))


#: Tiny per-language function-word lists for the n-gram/stopword language-ID
#: heuristic. Deliberately minimal and public-knowledge (no model download).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "los", "se", "del", "las"),
    "de": ("der", "die", "und", "das", "von", "mit", "den", "ist", "ein", "im"),
    "fr": ("le", "la", "les", "de", "des", "et", "en", "une", "est", "que"),
}


def lang_scores(c: Column | str) -> dict[str, Column]:
    """Stopword-hit count per candidate language."""
    return {lang: stopword_count(c, sw) for lang, sw in LANG_STOPWORDS.items()}


def detect_lang(c: Column | str, threshold: int = 1) -> Column:
    """Pick the language with the most stopword hits; ``'und'`` when no
    language reaches ``threshold``. Ties break by language-code order
    (deterministic). A real deployment would swap in fastText/CLD3 behind the
    same column contract."""
    scores = lang_scores(c)
    # struct(score, neg-ordered lang) max -> argmax with deterministic ties.
    pairs = [
        F.struct(s.alias("score"), F.lit(lang).alias("lang"))
        for lang, s in sorted(scores.items(), reverse=True)
    ]
    best = F.greatest(*pairs)
    return F.when(best["score"] >= threshold, best["lang"]).otherwise(F.lit("und"))


def quality_score(c: Column | str, stopwords: Sequence[str] = LANG_STOPWORDS["en"]) -> Column:
    """Composite [0,1] quality heuristic: length band + stopword presence +
    low punctuation density. Mirrors common pretraining-data filters
    (C4/Gopher-style rules) as pure expressions."""
    n_tok = token_count(c)
    len_ok = F.when((n_tok >= 5) & (n_tok <= 100000), 1.0).otherwise(0.0)
    sw = F.coalesce(stopword_ratio(c, stopwords), F.lit(0.0))
    sw_ok = F.when(sw > 0.01, 1.0).otherwise(0.0)
    punct = F.coalesce(punct_ratio(c), F.lit(1.0))
    punct_ok = F.when(punct < 0.3, 1.0).otherwise(0.0)
    return (len_ok + sw_ok + punct_ok) / F.lit(3.0)


def shingles(c: Column | str, n: int = 3) -> Column:
    """Token n-gram shingles -> ArrayType(StringType) of space-joined n-grams.
    Documents shorter than ``n`` tokens yield their whole text as the single
    shingle (so they still participate in similarity).

    Formulated as ``arrays_zip`` of ``n`` shifted slices + a lambda that
    touches ONLY the zipped element — never as a lambda that slices the
    token array per index. Catalyst does not CSE into lambda bodies, so
    that shape re-runs the regex tokenizer once PER SHINGLE (~200x/doc);
    this one evaluates it ``n+1`` times per row. Measured on the MinHash
    path at sf0.1: 76s -> ~2s for 5000 signatures."""
    toks = tokens(c)
    if n == 1:
        return toks  # avoid the n-gram expression tree for the unigram case
    k = F.size(toks)
    m = k - n + 1  # shingle count when k >= n
    zipped = F.arrays_zip(*[F.slice(toks, i + 1, m) for i in range(n)])
    grams = F.transform(
        zipped, lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(n)])
    )
    return F.when(k >= n, grams).otherwise(F.array(F.concat_ws(" ", toks)))


def char_kgrams(c: Column | str, k: int = 8) -> Column:
    """Character k-gram array over lowercased, whitespace-normalized text.
    Texts shorter than ``k`` chars yield the whole text as a single gram so
    short documents still fingerprint deterministically.

    CALLER CONTRACT: pass a cheap input (a materialized column attribute,
    or at worst a raw text column) — the normalization expression is
    referenced inside the per-index lambda, and Catalyst does not CSE into
    lambda bodies, so an EXPENSIVE input expression would re-evaluate per
    character. ``winnow_fingerprints`` materializes the normalized text
    first; a zipped-slices formulation (as in :func:`shingles`) measured
    3x SLOWER here because the per-char split array + k-wide struct zip
    allocates far more than per-element ``substr`` on an attribute."""
    norm = F.lower(collapse_ws(c))
    n = F.length(norm)
    grams = F.transform(
        F.sequence(F.lit(1), n - k + 1),
        lambda i: norm.substr(i, F.lit(k)),
    )
    return F.when(n >= k, grams).otherwise(F.array(norm))


def kgram_hashes(c: Column | str, k: int = 8) -> Column:
    """Rolling k-gram hash array: md5 hex of every character k-gram. md5 hex
    strings serve as the hashes, compared lexicographically (fixed-width
    lowercase hex, so string order == numeric order) — which keeps the whole
    pipeline expressible in ANSI SQL for the DuckDB oracle.

    NB: winnowing window-selection over this array is deliberately NOT a
    pure-Column composition — referencing this (expensive) expression inside
    a higher-order-function lambda re-evaluates it per array element
    (Catalyst does not CSE into lambda bodies), turning O(n) work into
    O(n^2). Window selection lives in
    ``operators.neardup.winnow_fingerprints`` as a row-based sliding
    window-frame min instead."""
    return F.transform(char_kgrams(c, k), F.md5)


#: PII patterns, deliberately RE2-and-Java-regex-compatible so the DuckDB
#: oracle can run the identical patterns (no lookaround, no backrefs).
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b"
PII_PHONE = r"\+?[0-9][0-9()\- ]{6,}[0-9]"


def redact_pii(c: Column | str) -> Column:
    """Regex PII redaction (emails, IPv4 addresses, phone-like digit runs)
    as chained ``regexp_replace`` expressions — JVM-side, codegen'd, zero
    shuffle. Email/IP run before the greedier phone pattern so their
    replacements aren't re-matched. A production pipeline would extend the
    pattern set (SSNs, IBANs, ...) behind the same column contract."""
    out = F.regexp_replace(_col(c), PII_EMAIL, "<EMAIL>")
    out = F.regexp_replace(out, PII_IPV4, "<IP>")
    out = F.regexp_replace(out, PII_PHONE, "<PHONE>")
    return out


def bpe_ish_token_count_pandas(c: Column | str) -> Column:
    """Arrow-vectorized twin of ``bpe_ish_token_count``: the same BPE-ish
    regex evaluated by a ``@pandas_udf`` over Arrow batches.

    Exists to pin the engine's Python-UDF tier contract (scalar pandas_udf,
    never row-at-a-time): the expression version stays the default — it is
    codegen'd JVM-side — and the unit suite asserts both tiers agree."""
    import pandas as pd  # noqa: F401 (resolves the annotation below)
    from pyspark.sql.functions import pandas_udf

    def _count(s):
        return s.str.count(BPE_ISH_PATTERN).fillna(0).astype("int32")

    _count.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_count, "int")(_col(c))


def with_bpe_ish_token_count_arrow(
    df, text_col: str = "text", out_col: str = "n_tokens"
):
    """Arrow-NATIVE tier of the token counter: ``mapInArrow`` with
    ``pyarrow.compute.count_substring_regex`` — no pandas materialization at
    all (RecordBatch in, RecordBatch out; the regex runs in Arrow's C++
    kernels). The third rung of the UDF policy ladder (JVM expression >
    pandas_udf > mapInArrow for batch-native libs); all three tiers are
    pinned equal in the unit suite.

    Returns ``df`` plus ``out_col`` (int64; 0 for empty, NULL for NULL).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from pyspark.sql.types import LongType, StructField

    def _batches(it):
        for batch in it:
            counts = pc.count_substring_regex(
                batch.column(text_col), pattern=BPE_ISH_PATTERN
            ).cast(pa.int64())
            yield pa.RecordBatch.from_arrays(
                [*batch.columns, counts], names=[*batch.schema.names, out_col]
            )

    from pyspark.sql.types import StructType

    out_schema = StructType(list(df.schema.fields) + [StructField(out_col, LongType())])
    return df.mapInArrow(_batches, out_schema)


def _jaro_winkler_py(s1: str, s2: str) -> float:
    """Pure-Python Jaro-Winkler (public algorithm: Winkler 1990) matching
    DuckDB's `jaro_winkler_similarity` bit-for-bit (fuzz-verified over
    random string pairs incl. the empty-string edge where similarity is 0,
    prefix bonus capped at 4 chars, scaling 0.1, boost threshold 0.7)."""
    l1, l2 = len(s1), len(s2)
    if not l1 or not l2:
        return 0.0
    if s1 == s2:
        return 1.0
    md = max(l1, l2) // 2 - 1
    m1 = [False] * l1
    m2 = [False] * l2
    matches = 0
    for i, c in enumerate(s1):
        lo, hi = max(0, i - md), min(l2, i + md + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if not matches:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    j = (matches / l1 + matches / l2 + (matches - t) / matches) / 3
    if j > 0.7:
        pl = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            pl += 1
        j += pl * 0.1 * (1 - j)
    return j


def jaro_winkler(a: Column | str, b: Column | str) -> Column:
    """Jaro-Winkler similarity of two string columns as an Arrow-batched
    ``pandas_udf`` (Spark has no builtin; a row-at-a-time Python UDF is the
    forbidden tier). Intended for BLOCKED candidate pairs only — the
    caller bounds the pair count; the function itself is O(len^2) per
    pair."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # no type hints: pandas_udf would try to infer the UDF kind from them
    # and reject the (Series, Series) -> Series spelling with a local import
    def _jw(xs, ys):
        return pd.Series(
            [
                _jaro_winkler_py(x, y) if x is not None and y is not None else None
                for x, y in zip(xs, ys)
            ],
            dtype="float64",
        )

    # non-deterministic ON PURPOSE (optimization guide §4.4): a filter on
    # the UDF's output column otherwise gets pushed below the projection
    # WITH the UDF substituted in, leaving two ArrowEvalPython nodes that
    # each score every pair (seen in jaro_winkler_blocked_pairs' plan).
    # The marker stops the optimizer from duplicating the expensive
    # expression; the function itself is pure, values are unchanged.
    return pandas_udf(_jw, "double").asNondeterministic()(_col(a), _col(b))


def nfc_normalize_pandas(c: Column | str) -> Column:
    """Unicode NFC normalization (UAX #15 canonical composition) as an
    Arrow-batched scalar ``pandas_udf`` over ``unicodedata.normalize`` —
    Spark has no normalization builtin, and normalization tables are the
    one text transform a regexp cannot express. Per-row only because
    composition is; the batch transfer is Arrow (UDF-policy tier 2, same
    as jaro_winkler above). Web corpora need this before fingerprinting:
    'é' composed and 'e'+U+0301 decomposed hash differently but read
    identically, so un-normalized dedup under-merges."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _nfc(s):
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        )

    # `from __future__ import annotations` stringifies hints, which the
    # pandas_udf type-inferencer can't resolve against a local `pd` —
    # assign real annotation objects instead (the _count pattern above).
    _nfc.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_nfc, "string")(_col(c))

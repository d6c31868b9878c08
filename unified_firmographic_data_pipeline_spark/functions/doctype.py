"""Document-type routing signals: code vs prose vs tabular/list text.

Web-scale pretraining mixtures route documents by coarse type before any
per-type pipeline runs (code gets lexer-aware dedup and license checks,
prose gets LM quality scoring, tables get structure extraction — cf. the
published Stack/RefinedWeb-style preprocessing stacks). The router needs
only cheap surface statistics; these are pure ``Column -> Column``
expressions (SURVEY §2.L policy), each independently usable as a feature
and combined by :func:`classify_doctype` with a transparent, documented
rule — no opaque model, so the decision is auditable and replayable in
any SQL engine (plain regexp counts and ratios).

Signals:
- ``symbol_density``: share of characters from the code-symbol alphabet
  ``{}();=<>[]`` — high in code, near zero in prose;
- ``indent_line_ratio``: share of lines starting with 2+ spaces or a tab
  (block structure);
- ``delimiter_line_ratio``: share of lines containing 2+ pipe/comma/tab
  delimiters (tables, CSV-ish, markdown tables);
- ``ident_token_ratio``: share of tokens shaped like code identifiers
  (camelCase, snake_case, dotted.paths, UPPER_CONST).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _nlines(c: Column) -> Column:
    return F.size(F.split(c, "\n")).cast("long")


def symbol_density(c: Column | str) -> Column:
    """Share of characters in ``{}();=<>[]`` — NULL on empty/NULL text."""
    c = _col(c)
    n = F.length(c)
    hits = n - F.length(F.regexp_replace(c, r"[{}();=<>\[\]]", ""))
    return F.when(n > 0, F.round(hits.cast("double") / n.cast("double"), 6)).otherwise(
        F.lit(None).cast("double")
    )


def indent_line_ratio(c: Column | str) -> Column:
    """Share of lines starting with two+ spaces or a tab."""
    c = _col(c)
    lines = F.split(c, "\n")
    indented = F.size(
        F.filter(lines, lambda ln: ln.rlike("^(  |\t)"))
    ).cast("long")
    return F.when(
        c.isNotNull() & (F.length(c) > 0),
        F.round(indented.cast("double") / _nlines(c).cast("double"), 6),
    ).otherwise(F.lit(None).cast("double"))


def delimiter_line_ratio(c: Column | str) -> Column:
    """Share of lines with 2+ column delimiters (| , or tab) — tables and
    CSV-ish content."""
    c = _col(c)
    lines = F.split(c, "\n")
    delim = F.size(
        F.filter(lines, lambda ln: ln.rlike(r"([|,\t][^|,\t\n]*){2}[|,\t]?"))
    ).cast("long")
    return F.when(
        c.isNotNull() & (F.length(c) > 0),
        F.round(delim.cast("double") / _nlines(c).cast("double"), 6),
    ).otherwise(F.lit(None).cast("double"))


#: identifier SHAPES: each alternative requires a marker no prose word has
#: (an underscore, an internal capital, an internal dot into a letter) —
#: matched as occurrences anywhere in the text, because real code wraps
#: identifiers in call/index syntax (``compute_value(argv[0]);``) that a
#: whole-token match would miss.
_IDENT_PATTERN = (
    r"\b(?:[a-z0-9]+_[a-z0-9_]+"                       # snake_case
    r"|[a-z]+[A-Z][A-Za-z0-9]*"                         # camelCase
    r"|[A-Za-z][A-Za-z0-9]*(?:\.[A-Za-z][A-Za-z0-9]*)+"  # dotted.path
    r"|[A-Z0-9]+_[A-Z0-9_]+)\b"                         # UPPER_CONST
)


def ident_token_ratio(c: Column | str) -> Column:
    """Code-identifier occurrences (snake_case / camelCase / dotted.path /
    UPPER_CONST, counted anywhere in the text) per whitespace token —
    plain prose words carry none of the shape markers, so this sits at
    0.0 on prose and climbs with identifier density in code."""
    from unified_firmographic_data_pipeline_spark.functions.text import tokens

    c = _col(c)
    toks = tokens(c)
    n = F.size(toks)
    hits = F.size(F.regexp_extract_all(c, F.lit(_IDENT_PATTERN), 0)).cast("long")
    return F.when(
        c.isNotNull() & (n > 0) & ~((n == 1) & (F.element_at(toks, 1) == "")),
        F.round(hits.cast("double") / n.cast("double"), 6),
    ).otherwise(F.lit(None).cast("double"))


def classify_doctype(
    c: Column | str,
    code_symbol_min: float = 0.04,
    code_ident_min: float = 0.15,
    table_delim_min: float = 0.5,
) -> Column:
    """Transparent rule router: ``'table'`` when most lines carry 2+
    delimiters; else ``'code'`` when symbol density or identifier-token
    share clears its threshold; else ``'prose'``; NULL on empty/NULL.
    Threshold defaults were picked on constructed fixtures (see tests) —
    callers tune per corpus; the signals are the stable part."""
    c = _col(c)
    return (
        F.when(c.isNull() | (F.length(c) == 0), F.lit(None).cast("string"))
        .when(delimiter_line_ratio(c) >= table_delim_min, F.lit("table"))
        .when(
            (symbol_density(c) >= code_symbol_min)
            | (ident_token_ratio(c) >= code_ident_min),
            F.lit("code"),
        )
        .otherwise(F.lit("prose"))
    )

"""Staging-layer cleaning expressions (the dbt macro analogues).

Each function mirrors a cleaning idiom of the reference's staging SQL
(SURVEY.md §2.E; reference files ``firmographics_dbt/models/staging/*.sql``
and ``firmographics_dbt/macros/parse_numeric.sql``) as a composable Catalyst
expression. Semantics note (SURVEY.md §7.3c): Snowflake ``::type`` errors on
malformed input where Spark ``cast`` yields NULL; the reference pre-cleans
every cast input (NULLIF/REPLACE), so on clean input the two agree. This
engine adopts NULL-on-error as the documented default.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def nullif_empty(c: Column | str) -> Column:
    """``NULLIF(x, '')`` — empty string to NULL before casts.

    Reference: ``stg_wiki_sp500.sql:28``, ``stg_fortune500.sql:41-43``.
    """
    c = _col(c)
    return F.when(c == "", F.lit(None)).otherwise(c)


def parse_money(c: Column | str) -> Column:
    """Money string (``"$648,125"``, ``"$-1,234.5"``) -> DoubleType.

    Analogue of the ``parse_money_to_float`` macro
    (``firmographics_dbt/macros/parse_numeric.sql:1-6``):
    ``nullif(regexp_replace(field, '[$,]', ''), '')::float``.
    """
    return nullif_empty(F.regexp_replace(_col(c), r"[$,]", "")).cast("double")


def parse_pct(c: Column | str, default: float = 0.0) -> Column:
    """Percent string (``"6%"``, ``""``) -> DoubleType, empty -> ``default``.

    Reference: ``stg_fortune500.sql:42-43`` (``replace(...,'%','')`` +
    ``nullif`` + ``coalesce(..., 0)``).
    """
    cleaned = nullif_empty(F.regexp_replace(_col(c), "%", "")).cast("double")
    return F.coalesce(cleaned, F.lit(float(default)))


def parse_int_commas(c: Column | str) -> Column:
    """Comma-grouped int string (``"2,100,000"``) -> LongType, empty -> NULL.

    Reference: ``stg_fortune500.sql:41`` (employees).
    """
    return nullif_empty(F.regexp_replace(_col(c), ",", "")).cast("long")


def yes_no_to_bool(c: Column | str) -> Column:
    """``'yes'`` -> true, anything else (incl. NULL) -> false.

    Reference: ``iff(data:"..."::string = 'yes', true, false)`` ×11 flags,
    ``stg_fortune500.sql:50-60``. Snowflake IFF with a NULL condition takes
    the false branch, so missing keys are false, not NULL — matched here.
    """
    c = _col(c)
    return F.when(c == "yes", F.lit(True)).otherwise(F.lit(False))


def none_to_null(c: Column | str, sentinel: str = "none") -> Column:
    """Map a sentinel string to NULL (``IFF(hq = 'none', NULL, hq)``).

    Reference: ``stg_wiki_sp500.sql:32-33``.
    """
    c = _col(c)
    return F.when(c == sentinel, F.lit(None).cast("string")).otherwise(c)


def first4_year(c: Column | str) -> Column:
    """First 4 chars -> IntegerType year; ``"1976 (reorganized 1984)"`` -> 1976.

    Reference: ``substring(data:"Founded"::string, 1, 4)::int``,
    ``stg_wiki_sp500.sql:29``.
    """
    return F.substring(_col(c), 1, 4).cast("int")


def split_first(c: Column | str, sep: str = " (") -> Column:
    """``SPLIT(security, ' (')[0]`` — strip a parenthetical suffix.

    Reference: ``stg_wiki_sp500.sql:25``. NOTE: Snowflake SPLIT takes a
    literal separator while Spark ``split`` takes a Java regex — the
    separator is regex-escaped here so semantics match byte-for-byte
    (SURVEY.md §7.3c).
    """
    import re

    return F.split(_col(c), re.escape(sep)).getItem(0)


def strict_cast(c: Column | str, dtype: str) -> Column:
    """Snowflake-semantics cast: raise on unparseable input. NULL input
    still yields NULL — only a non-NULL value that fails to parse errors.

    Session-independent: under Spark 4 the session default (ANSI on)
    already raises, but this stays strict even if a deployment disables
    ANSI. Lenient twin: ``lenient_cast``. (SURVEY.md §7.3c, E8.)"""
    c = _col(c)
    casted = c.try_cast(dtype)
    return F.when(
        c.isNotNull() & casted.isNull(),
        F.raise_error(
            F.concat(
                F.lit(f"strict_cast to {dtype} failed for value: "),
                c.cast("string"),
            )
        ).cast(dtype),
    ).otherwise(casted)


def lenient_cast(c: Column | str, dtype: str) -> Column:
    """NULL-on-error cast (pre-ANSI Spark semantics), session-independent:
    the opt-out for permissive ingest paths where bad values should become
    NULL and be counted by the quality suite rather than abort the job."""
    return _col(c).try_cast(dtype)


def json_strict_valid(c: Column | str) -> Column:
    """Spark expression equivalent of DuckDB's ``json_valid(s)``.

    Spark's JSON readers (get_json_object, try_parse_json) accept a
    valid-prefix-plus-trailing-garbage string like ``{"k":1},{"k":2}``
    (they parse the first value and stop) where DuckDB's validator is
    strict — so any oracle guarded by json_valid needs THIS gate on the
    Spark side, not a bare try_parse_json. The trick: ``[s]`` must
    parse AND hold exactly ONE element (a trailing fragment that
    bracket-wraps into a valid array yields >1). Element existence is
    probed with schema_of_variant, which distinguishes a MISSING
    ``$[1]`` (NULL schema) from a JSON-null element ('VOID') — a plain
    try_variant_get cannot. Verified equal to json_valid on the full
    malformed-props sweep including comma fragments
    (tests/test_round4_fixes.py). Shared by the driver oracles
    (plans/driver_queries.py) and quality/drift.py."""
    c = _col(c)
    wrapped = F.try_parse_json(F.concat(F.lit("["), c, F.lit("]")))
    e0 = F.schema_of_variant(F.try_variant_get(wrapped, "$[0]", "variant"))
    e1 = F.schema_of_variant(F.try_variant_get(wrapped, "$[1]", "variant"))
    return wrapped.isNotNull() & e0.isNotNull() & e1.isNull()

"""Web-corpus expression builders — URL structure and HTML text.

A web-crawl training pipeline filters by domain before anything touches
the payload (provenance rules, licensing blocklists, quota-per-site).
These are the standard steps, all ``Column -> Column`` on Spark's
built-in ``try_parse_url`` / ``regexp_replace`` (zero UDFs, scan-fused):

- ``url_host`` / ``url_path`` — parse_url projections.
- ``registrable_domain`` — heuristic eTLD+1 (a bounded literal list of
  common second-level suffixes like ``co.uk``; the full Public Suffix
  List would ride the same expression as a bigger literal map or a
  broadcast join for the long tail).
- ``domain_blocklist_filter`` — two tiers: a literal suffix-match
  expression for small lists, a broadcast anti-join on the registrable
  domain for blocklists too big to inline in the plan.
- ``strip_html_tags`` — script/style blocks (with content), tags, and
  the common entities, as chained regexes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def url_host(c: Column | str) -> Column:
    """Lower-cased hostname of a URL (NULL for unparseable input, port
    stripped) — ``try_parse_url(..., 'HOST')`` normalized (ANSI parse_url RAISES on
    malformed input — the try_ tier is the dirty-crawl contract)."""
    return F.lower(F.try_parse_url(_col(c), F.lit("HOST")))


def url_path(c: Column | str) -> Column:
    """Path component (no query/fragment); NULL when unparseable."""
    return F.try_parse_url(_col(c), F.lit("PATH"))


#: second-level suffixes under which the registrable name is one label
#: deeper (example.co.uk -> example.co.uk, not co.uk). Bounded heuristic
#: subset of the Public Suffix List covering the common ccTLD patterns.
_SECOND_LEVEL = (
    "co", "com", "org", "net", "ac", "gov", "edu", "mil", "or", "ne", "go"
)


def registrable_domain(c: Column | str) -> Column:
    """Heuristic eTLD+1 from a URL: the last two host labels, or the last
    THREE when the middle label is a common second-level suffix with a
    2-letter ccTLD (``example.co.uk``). Hosts with fewer labels (bare
    ``localhost``) and IPv4 literals pass through unchanged. NULL for
    unparseable URLs."""
    host = url_host(c)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    is_ip = host.rlike(r"^\d+\.\d+\.\d+\.\d+$")
    second = F.try_element_at(labels, n - 1)
    tld = F.try_element_at(labels, n)
    three = (
        (n >= 3)
        & second.isin(*_SECOND_LEVEL)
        & (F.length(tld) == 2)
    )
    take = F.when(three, 3).otherwise(2)
    tail = F.slice(labels, (n - take + 1).cast("int"), take.cast("int"))
    return F.when(is_ip | (n < 2), host).otherwise(F.array_join(tail, "."))


def domain_blocklist_filter(
    df: DataFrame,
    url_col: str,
    blocked: Sequence[str] | None = None,
    blocked_df: DataFrame | None = None,
) -> DataFrame:
    """Drop rows whose URL host falls under a blocked domain.

    Two tiers by blocklist size:
    - ``blocked`` (small, inline): host == b or host endswith '.'+b for
      each literal — one bounded OR chain, scan-fused, no join.
    - ``blocked_df`` (large): single-column DataFrame of registrable
      domains; rows anti-join on ``registrable_domain(url)`` with the
      blocklist broadcast — the millions-of-domains regime where a
      literal chain would blow up the plan.
    Exactly one of the two must be provided."""
    if (blocked is None) == (blocked_df is None):
        raise ValueError("provide exactly one of blocked / blocked_df")
    if blocked is not None:
        host = url_host(url_col)
        cond = F.lit(False)
        for b in sorted(set(d.lower() for d in blocked)):
            cond = cond | (host == b) | host.endswith("." + b)
        return df.filter(~F.coalesce(cond, F.lit(False)))
    bl = blocked_df.toDF("__blocked_domain").select(
        F.lower(F.col("__blocked_domain")).alias("__blocked_domain")
    )
    return df.join(
        F.broadcast(bl),
        registrable_domain(F.col(url_col)) == F.col("__blocked_domain"),
        "left_anti",
    )


def strip_html_tags(c: Column | str) -> Column:
    """Visible text of an HTML payload: drop <script>/<style> blocks WITH
    their content, strip remaining tags and comments, decode the common
    entities, collapse whitespace. Chained regexp_replace — JVM-side,
    codegen'd; a DOM parser (the fetch module's table scraper) is the
    tier above when structure matters, this is the bulk-text tier."""
    out = F.regexp_replace(
        _col(c), r"(?is)<(script|style)\b[^>]*>.*?</\1\s*>", " "
    )
    out = F.regexp_replace(out, r"(?s)<!--.*?-->", " ")
    out = F.regexp_replace(out, r"(?s)<[^>]+>", " ")
    # &amp; decodes LAST: doing it first would double-decode the literal
    # text '&amp;lt;' (meaning '&lt;') all the way to '<'
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&#39;", "'"), ("&apos;", "'"), ("&nbsp;", " "), ("&amp;", "&"),
    ):
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(out, r"\s+", " "))

"""XML staging parse — the VARIANT boundary for XML-landed feeds.

Reference analogue (SURVEY.md §2.D): the staging models impose
schema-on-read on landed JSON payloads (``stg_wiki_sp500.sql:10-18``);
firmographic feeds equally arrive as XML (SEC EDGAR filings, sitemaps,
RSS). Spark 4 ships native XML SQL functions, so the same
parse-at-the-staging-boundary design holds with zero UDFs:

- ``from_xml`` parses a payload string into a typed struct per row
  (narrow, codegen'd, no shuffle) — the ``from_json`` twin.
- repeated child elements become ``array<...>`` fields, so the
  LATERAL-FLATTEN analogue is the same ``explode`` as the JSON path.
- ``xpath_*`` extracts single leaves without declaring a full schema —
  the ``get_json_object`` twin for quick probes.

All functions here are Column→Column / DataFrame→DataFrame narrow
transformations: at 100 TB they pipeline inside the scan stage with
nothing to re-partition.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType


def parse_xml_payload(
    df: DataFrame,
    payload_col: str,
    schema: StructType,
    parent_cols: Sequence[str] = (),
    out_col: str = "doc",
    lenient: bool = True,
) -> DataFrame:
    """Parse an XML payload column into one typed struct column.

    ``lenient=True`` (PERMISSIVE mode) turns malformed payloads into
    all-NULL structs instead of failing the job — the dirty-feed contract
    shared with ``flatten.flatten_variant``; ``False`` is FAILFAST for
    curated inputs where corruption must abort the load.
    """
    mode = "PERMISSIVE" if lenient else "FAILFAST"
    parsed = F.from_xml(F.col(payload_col), schema, {"mode": mode})
    return df.select(*parent_cols, parsed.alias(out_col))


def flatten_xml_array(
    df: DataFrame,
    payload_col: str,
    array_field: str,
    schema: StructType,
    parent_cols: Sequence[str] = (),
    out_col: str = "value",
    lenient: bool = True,
) -> DataFrame:
    """LATERAL FLATTEN for XML: one row per repeated ``<array_field>``
    child element, parent columns carried along.

    ``schema`` is the schema of the WHOLE payload root (with
    ``array_field`` declared as ``array<struct<...>>`` — repeated XML
    elements parse to arrays); the element rows come from exploding that
    field. ``explode`` drops rows whose array is NULL (malformed payload
    under ``lenient``) or empty — the same zero-rows contract as the JSON
    variant path.
    """
    parsed = parse_xml_payload(
        df, payload_col, schema, parent_cols=parent_cols, out_col="__doc", lenient=lenient
    )
    return parsed.select(
        *parent_cols, F.explode(F.col(f"__doc.{array_field}")).alias(out_col)
    )


def xml_is_well_formed(payload) -> F.Column:
    """Boolean Column: does ``payload`` parse as XML? Built on
    ``from_xml``'s corrupt-record channel (PERMISSIVE mode routes any
    parse failure into the named column) — no UDF, no exception path."""
    probe = F.from_xml(
        payload,
        StructType([StructField("_corrupt_record", StringType())]),
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
    )
    return payload.isNotNull() & probe["_corrupt_record"].isNull()


def xpath_leaf(
    df: DataFrame,
    payload_col: str,
    paths: dict[str, str],
    keep_cols: Sequence[str] = (),
    lenient: bool = True,
) -> DataFrame:
    """Extract scalar leaves by XPath without declaring a schema — the
    ``get_json_object`` analogue for probing a feed before the staging
    schema is pinned. ``paths`` maps output column name → XPath whose
    result is taken as a string (cast downstream with the cleaning
    helpers, mirroring the reference's ``::`` casts). A path that matches
    nothing yields NULL ('' from xpath_string is normalized to NULL, the
    VARIANT missing-path contract).

    ``xpath_string`` itself THROWS on malformed XML (unlike
    ``get_json_object``'s NULL), so ``lenient=True`` gates every
    extraction behind ``xml_is_well_formed`` — malformed payloads yield
    NULLs; CASE WHEN short-circuits so the throwing branch never runs."""
    cols = [F.col(c) for c in keep_cols]
    ok = xml_is_well_formed(F.col(payload_col)) if lenient else None
    for name, path in paths.items():
        raw = F.xpath_string(F.col(payload_col), F.lit(path))
        val = F.nullif(raw, F.lit(""))
        if ok is not None:
            val = F.when(ok, val)
        cols.append(val.alias(name))
    return df.select(*cols)


def infer_xml_schema(df: DataFrame, payload_col: str) -> str:
    """Schema-of-XML from ONE sampled payload (DDL string).

    Driver-side by necessity — ``schema_of_xml`` requires a literal — but
    bounded: exactly one row is collected regardless of table size. Use it
    interactively to draft the staging schema, then PIN the schema in the
    pipeline (inference must never be on the 100 TB hot path: it forces an
    extra scan and drifts with the data)."""
    sample = df.select(F.col(payload_col).alias("p")).where(F.col("p").isNotNull()).limit(1).collect()
    if not sample:
        raise ValueError(f"no non-null payloads in {payload_col!r} to infer from")
    spark = df.sparkSession
    return spark.range(1).select(
        F.schema_of_xml(F.lit(sample[0].p)).alias("s")
    ).collect()[0].s

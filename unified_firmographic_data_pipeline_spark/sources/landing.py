"""Raw landing readers — the COPY INTO analogue.

Reference (SURVEY.md §2.A A4): Snowflake
``COPY INTO raw.x FROM @stage FILE_FORMAT=(TYPE=JSON) PATTERN='...'`` loads
one VARIANT row per top-level JSON value with stamped ``source`` /
``ingested_at`` metadata (``dags/ingest_firmographics_to_snowflake.py:111-136``).

Spark-first mapping: ``spark.read.option('pathGlobFilter', ...).text(dir)``
— schema-on-read (the payload stays an unparsed JSON string, exactly like
VARIANT; parsing happens at the staging boundary), file pruning happens at
listing time (the PATTERN analogue), and metadata columns are stamped with
literals. COPY's load-once idempotency maps to the checkpointed streaming
file source (``streaming.ingest``) or a loaded-files ledger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_json_landing(
    spark: SparkSession,
    path: str,
    source_name: str,
    glob: str | None = None,
    whole_file: bool = True,
) -> DataFrame:
    """Read landed JSON files into the RAW-table shape
    ``(id, source, ingested_at, payload)``.

    ``whole_file=True`` gives one row per file whose payload is the entire
    document (the reference lands one JSON document per file — an array for
    wiki, an object for fortune). ``False`` reads JSON-lines (one row per
    line), the at-scale landing format.
    """
    reader = spark.read
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if whole_file:
        reader = reader.option("wholetext", True)
    raw = reader.text(path)
    return raw.select(
        F.monotonically_increasing_id().alias("id"),
        F.lit(source_name).alias("source"),
        F.current_timestamp().alias("ingested_at"),
        F.col("value").alias("payload"),
    )


def read_json_landing_variant(
    spark: SparkSession,
    path: str,
    source_name: str,
    glob: str | None = None,
    whole_file: bool = True,
    strict: bool = False,
) -> DataFrame:
    """VariantType twin of :func:`read_json_landing` — the RAW tier with
    the payload as a real Spark 4 ``VARIANT`` column instead of an
    unparsed string (SURVEY.md §1.2 names this as the alternative mapping
    of Snowflake's VARIANT; round-9 verdict item #5). Same
    ``(id, source, ingested_at, payload)`` shape and stamping contract as
    the string tier; downstream staging extracts with
    ``variant_get``/``variant_explode`` instead of ``from_json`` paths.

    ``strict=False`` (default, COPY's ``ON_ERROR=CONTINUE`` analogue)
    parses with ``try_parse_json`` — an unparseable document lands as a
    NULL payload, countable by the quality suite. ``strict=True``
    (``ON_ERROR=ABORT_STATEMENT``) uses ``parse_json``, which raises on
    the first malformed document.

    Scale note: the binary variant encoding is decoded once at land time
    and every later path extraction skips string re-parsing — the right
    trade when multiple staging models read the same raw table (the
    reference reads each raw table from two staging models). The string
    tier stays preferable when the payload is extracted at most once."""
    raw = read_json_landing(spark, path, source_name, glob, whole_file)
    parse = F.parse_json if strict else F.try_parse_json
    return raw.withColumn("payload", parse(F.col("payload")))


def read_xml_landing(
    spark: SparkSession,
    path: str,
    source_name: str,
    glob: str | None = "*.xml",
) -> DataFrame:
    """XML twin of ``read_json_landing``: one row per landed XML document,
    payload kept as the unparsed text (VARIANT-style schema-on-read —
    parsing happens at the staging boundary via ``operators.xmlstage``).
    XML documents are whole-file by nature (one root element), so there is
    no line-mode variant."""
    return read_json_landing(
        spark, path, source_name, glob=glob, whole_file=True
    )

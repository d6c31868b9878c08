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

"""Semi-structured flatten — Spark's analogue of ``LATERAL FLATTEN``.

Reference (SURVEY.md §2.D D1/D2): one row per element of a VARIANT JSON
array, parent columns repeated per element
(``stg_wiki_sp500.sql:10-18``, ``stg_fortune500.sql:10-24``).

Spark-first design: ``from_json`` with an explicit element schema parses the
payload lazily per-row (schema-on-read, imposed at the staging boundary just
like the reference's ``::`` casts), then ``explode`` is the lateral unnest.
Both are narrow operations — no shuffle, fully pipelined in codegen.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DataType


def flatten_json_array(
    df: DataFrame,
    payload_col: str,
    element_schema: DataType,
    parent_cols: Sequence[str] = (),
    array_path: str | None = None,
    out_col: str = "value",
) -> DataFrame:
    """Explode a JSON-array payload column into one row per element.

    ``element_schema`` is the element's StructType (drift-tolerant variant:
    pass ``MapType(StringType(), StringType())``). ``array_path`` addresses a
    nested array inside a JSON object payload (e.g. ``"items"`` for the
    Fortune payload's ``payload:items``, ``stg_fortune500.sql:23``); None
    means the payload itself is the array (wiki payload).
    """
    if array_path is None:
        arr = F.from_json(F.col(payload_col), ArrayType(element_schema))
    else:
        # Pull the nested array out as JSON text first (missing path -> NULL,
        # matching Snowflake VARIANT ':' semantics), then parse.
        arr = F.from_json(
            F.get_json_object(F.col(payload_col), f"$.{array_path}"),
            ArrayType(element_schema),
        )
    return df.select(*parent_cols, F.explode(arr).alias(out_col))


def flatten_variant(
    df: DataFrame,
    payload_col: str,
    parent_cols: Sequence[str] = (),
    array_path: str | None = None,
    out_col: str = "value",
    lenient: bool = False,
) -> DataFrame:
    """Spark-4 VARIANT-native flatten — the closest analogue of Snowflake's
    ``LATERAL FLATTEN(input => payload)`` (``stg_wiki_sp500.sql:16-17``):
    ``parse_json`` produces a VariantType and ``LATERAL variant_explode``
    unnests it, keeping elements as variants (schema-on-read preserved all
    the way; extract typed fields later with ``variant_get``).
    ``lenient=True`` swaps in ``try_parse_json``: malformed payloads
    become NULL variants and contribute ZERO exploded rows instead of
    failing the job — the right contract for dirty event streams."""
    import uuid

    spark = df.sparkSession
    view = f"__flatten_variant_{uuid.uuid4().hex[:8]}"
    df.createOrReplaceTempView(view)
    fn = "try_parse_json" if lenient else "parse_json"
    expr = f"{fn}({payload_col})"
    if array_path is not None:
        expr = f"variant_get({expr}, '$.{array_path}')"
    cols = ", ".join([*parent_cols, f"f.value AS {out_col}"])
    out = spark.sql(f"SELECT {cols} FROM {view}, LATERAL variant_explode({expr}) f")
    spark.catalog.dropTempView(view)
    return out

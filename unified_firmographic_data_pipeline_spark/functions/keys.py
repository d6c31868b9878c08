"""Identity / surrogate-key expressions.

The reference derives every star-schema key with
``dbt_utils.generate_surrogate_key`` (dbt_utils 1.3.0, pinned at
``firmographics_dbt/packages.yml:2-3``; used at
``models/star/dim_company.sql:3``, ``fact_company_performance.sql:3-5``,
``snapshots/*.sql:14``). Fact and dimension keys must agree byte-for-byte, so
this expression reproduces the public macro semantics exactly
(SURVEY.md §2.F F1).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

#: dbt_utils 1.3.0's null placeholder, verbatim.
NULL_SENTINEL = "_dbt_utils_surrogate_key_null_"


def surrogate_key(cols: Sequence[Column | str]) -> Column:
    """``md5(coalesce(cast(c1 as varchar), SENTINEL) || '-' || ...)``.

    Deterministic, null-safe, order-sensitive — byte-exact with
    dbt_utils.generate_surrogate_key (see FIXTURES.md §6 golden values).
    ``concat_ws`` would *skip* NULLs rather than substitute the sentinel, so
    each component is coalesced first, after which concat_ws('-') is exactly
    the ``|| '-' ||`` chain.
    """
    parts = [
        F.coalesce(
            (F.col(c) if isinstance(c, str) else c).cast("string"),
            F.lit(NULL_SENTINEL),
        )
        for c in cols
    ]
    return F.md5(F.concat_ws("-", *parts))


def row_id() -> Column:
    """Auto-increment row-id analogue of the RAW tables' identity column
    (reference README.md:313,336). Non-dense, partition-monotonic — fine for
    lineage ids; use ``row_number()`` over an explicit order when density
    matters."""
    return F.monotonically_increasing_id()

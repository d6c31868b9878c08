"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no streaming surface (SURVEY.md §2.K) — these are the
engine's Spark-idiomatic extensions for the ingest path:

- ``streaming_dedup_by_key``: exactly-once *by key* across micro-batches
  (the keyed upgrade of the file source's exactly-once-per-file): the first
  row per key passes, replays/duplicates are dropped. State per key is a
  single seen-marker with a TTL timeout, so state size is bounded by live
  keys × TTL window, not history.
- ``streaming_running_totals``: per-key running count/sum maintained in
  state — the streaming twin of a grouped aggregation with
  ``outputMode("update")``, expressed as a custom operator so arbitrary
  per-key logic (decay, thresholds, alerts) can ride along.

Both operate over Arrow-batched pandas groups (GroupState protocol), the
designated Python tier — never row-at-a-time.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

DEDUP_OUT_SCHEMA_DDL = "key long, first_seen_batch_rows long"
DEDUP_STATE_SCHEMA = StructType([StructField("seen", LongType())])

TOTALS_OUT_SCHEMA_DDL = "key long, n_events long, total long"
TOTALS_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", LongType())]
)


def _make_dedup_fn(ttl_ms: int | None):
    def _dedup_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()  # TTL expiry: evict the seen-marker
            return iter(())
        n_rows = 0
        for pdf in pdfs:
            n_rows += len(pdf)
        if state.exists:
            return iter(())  # replay/duplicate key -> drop
        state.update((1,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        return iter(
            [pd.DataFrame({"key": [key[0]], "first_seen_batch_rows": [n_rows]})]
        )

    return _dedup_fn


def streaming_dedup_by_key(
    stream: DataFrame, key_col: str, ttl_hours: float | None = None
) -> DataFrame:
    """Keyed streaming dedup: emit each key once (first batch it appears),
    drop later occurrences. Input must be a streaming DataFrame.

    ``ttl_hours`` bounds state to live keys × TTL window for continuous
    (24×7) queries. Leave it ``None`` for ``availableNow``/catch-up runs:
    with a processing-time timeout registered, Spark schedules extra
    no-data micro-batches to fire expirations, so a bounded run with a
    long TTL would spin on empty batches instead of terminating.
    """
    return (
        stream.selectExpr(f"CAST({key_col} AS LONG) AS key")
        .groupBy("key")
        .applyInPandasWithState(
            _make_dedup_fn(None if ttl_hours is None else int(ttl_hours * 3600_000)),
            outputStructType=DEDUP_OUT_SCHEMA_DDL,
            stateStructType=DEDUP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.NoTimeout
                if ttl_hours is None
                else GroupStateTimeout.ProcessingTimeTimeout
            ),
        )
    )


def _totals_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += int(pdf["value"].sum())
    state.update((n, total))
    return iter([pd.DataFrame({"key": [key[0]], "n_events": [n], "total": [total]})])


def streaming_running_totals(stream: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Per-key running (count, sum) maintained in group state; emits the
    updated totals for keys touched in each micro-batch."""
    return (
        stream.selectExpr(
            f"CAST({key_col} AS LONG) AS key", f"CAST({value_col} AS LONG) AS value"
        )
        .groupBy("key")
        .applyInPandasWithState(
            _totals_fn,
            outputStructType=TOTALS_OUT_SCHEMA_DDL,
            stateStructType=TOTALS_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

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
from pyspark.sql import functions as F
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


# ------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4's successor to applyInPandasWithState):
# typed per-key state handles (ValueState/ListState/MapState), native state
# TTL, timers, and schema evolution — the modern home for custom stateful
# logic. Both per-key operators above are re-expressed here so users on
# either API level have the same semantics.
# ------------------------------------------------------------------------

try:  # Spark >= 4.0
    from pyspark.sql.streaming import StatefulProcessor

    TWS_AVAILABLE = True
except ImportError:  # pragma: no cover - older runtime
    StatefulProcessor = object  # type: ignore[assignment,misc]
    TWS_AVAILABLE = False

# transformWithStateInPandas runs a dedicated Python "driver worker" that
# speaks protobuf to the JVM; without a working google.protobuf the query
# fails at initialization (STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE).
# Standard Spark clusters ship protobuf with pyspark[connect]; this sandbox
# does not, so runtime use is gated exactly like the media codecs.
try:  # pragma: no cover - environment probe
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401

    TWS_RUNTIME_AVAILABLE = TWS_AVAILABLE
except ImportError:
    TWS_RUNTIME_AVAILABLE = False


class RunningTotalsProcessor(StatefulProcessor):
    """Per-key running (count, sum) in a typed ValueState."""

    def init(self, handle) -> None:
        self._totals = handle.getValueState("totals", "n LONG, total LONG")

    def handleInputRows(self, key, rows, timerValues):
        if self._totals.exists():
            n, total = self._totals.get()
        else:
            n, total = 0, 0
        for pdf in rows:
            n += len(pdf)
            total += int(pdf["value"].sum())
        self._totals.update((n, total))
        yield pd.DataFrame({"key": [key[0]], "n_events": [n], "total": [total]})

    def close(self) -> None:
        pass


class DedupByKeyProcessor:
    """First row per key passes; replays drop. With ``ttl_ms`` the
    seen-marker auto-evicts via native state TTL (no manual timer
    choreography, unlike the GroupStateTimeout variant above) so state is
    bounded by live keys x TTL window."""

    def __new__(cls, ttl_ms: int | None = None):
        # build the concrete StatefulProcessor lazily so importing this
        # module never requires the Spark 4 API
        class _P(StatefulProcessor):
            def init(self, handle) -> None:
                self._seen = handle.getValueState("seen", "seen LONG", ttl_ms)

            def handleInputRows(self, key, rows, timerValues):
                n_rows = sum(len(pdf) for pdf in rows)
                if self._seen.exists():
                    return
                self._seen.update((1,))
                yield pd.DataFrame(
                    {"key": [key[0]], "first_seen_batch_rows": [n_rows]}
                )

            def close(self) -> None:
                pass

        return _P()


def _keyed_projection(stream: DataFrame, key_col: str) -> DataFrame:
    """Project ``key = CAST(key_col AS LONG)`` plus the remaining payload
    columns. The cast alias plus every OTHER column is selected explicitly —
    a bare ``"*"`` would duplicate the name when the input already has a
    ``key`` column, making the downstream ``groupBy("key")`` ambiguous."""
    rest = [F.col(c) for c in stream.columns if c != "key"]
    return stream.select(F.col(key_col).cast("long").alias("key"), *rest)


def tws_running_totals(stream: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """``streaming_running_totals`` on the transformWithStateInPandas API."""
    return (
        stream.selectExpr(
            f"CAST({key_col} AS LONG) AS key", f"CAST({value_col} AS LONG) AS value"
        )
        .groupBy("key")
        .transformWithStateInPandas(
            statefulProcessor=RunningTotalsProcessor(),
            outputStructType=TOTALS_OUT_SCHEMA_DDL,
            outputMode="Update",
            timeMode="None",
        )
    )


def tws_dedup_by_key(
    stream: DataFrame, key_col: str, ttl_hours: float | None = None
) -> DataFrame:
    """``streaming_dedup_by_key`` on the transformWithStateInPandas API;
    TTL (when set) is enforced by the state store itself."""
    ttl_ms = None if ttl_hours is None else int(ttl_hours * 3600_000)
    return (
        _keyed_projection(stream, key_col)
        .groupBy("key")
        .transformWithStateInPandas(
            statefulProcessor=DedupByKeyProcessor(ttl_ms),
            outputStructType=DEDUP_OUT_SCHEMA_DDL,
            outputMode="Append",
            timeMode="None" if ttl_ms is None else "ProcessingTime",
        )
    )


# ------------------------------------------------------------------------
# Streaming Holt-Winters: the stateful-forecasting twin of
# operators/holtwinters.holt_winters_daily. State carries (t, level,
# trend, 7 seasonal slots) in integer micro-units plus the pre-init
# buffer; every update is the SAME rha() integer recurrence, so the
# stream's emitted rows are BIT-EQUAL to the batch operator's smoothed
# rows over the same data (pinned in tests). Contract: days arrive in
# chronological order across micro-batches (within a batch they may be
# unsorted — the group fn sorts); late/replayed days are the windowed
# operators' business, not this recurrence's.
# ------------------------------------------------------------------------

HW_OUT_SCHEMA_DDL = (
    "series long, day string, n_events long, fitted double, "
    "level double, trend double, seasonal double"
)
HW_STATE_SCHEMA_DDL = (
    "t long, l long, b long, seas array<long>, "
    "buf_days array<string>, buf_counts array<long>"
)


def _hw_fn(key: tuple, pdfs: "Iterator[pd.DataFrame]", state: GroupState):
    from unified_firmographic_data_pipeline_spark.operators.holtwinters import rha

    m = 7
    if state.exists:
        t, l, b, seas, buf_days, buf_counts = state.get
        seas = list(seas)
        buf = list(zip(buf_days, buf_counts))
    else:
        t, l, b, seas, buf = 0, 0, 0, [0] * m, []

    incoming: list[tuple[str, int]] = []
    for pdf in pdfs:
        incoming.extend(zip(pdf["day"].astype(str), pdf["c"].astype(int)))
    incoming.sort()

    out_rows: list[tuple] = []

    def step(day: str, c: int, t_new: int):
        nonlocal l, b
        slot = (t_new - 1) % m
        s_lag = seas[slot]
        xm = c * 1_000_000
        fitted = l + b + s_lag
        l_new = rha(xm - s_lag + l + b, 2)
        b = rha((l_new - l) + 3 * b, 4)
        seas[slot] = rha((xm - l_new) + 3 * s_lag, 4)
        l = l_new
        out_rows.append(
            (
                key[0],
                day,
                c,
                round(fitted / 1e6, 6),
                round(l / 1e6, 6),
                round(b / 1e6, 6),
                round(seas[slot] / 1e6, 6),
            )
        )

    for day, c in incoming:
        if t == 0:
            buf.append((day, int(c)))
            # initialize only once 2m+1 days exist — the BATCH operator
            # returns an empty frame for any series shorter than 2m+1, so
            # emitting the replayed buffer at exactly 2m days would break
            # the bit-equal-to-batch contract for a stream that ends there
            # (round-7 ADVICE #1); the replay below then covers t=m+1..2m+1
            if len(buf) >= 2 * m + 1:
                xs = [x for _, x in buf]
                sum1, sum2 = sum(xs[:m]), sum(xs[m : 2 * m])
                l = rha(sum1 * 1_000_000, m)
                b = rha((sum2 - sum1) * 1_000_000, m * m)
                for i in range(m):
                    seas[i] = xs[i] * 1_000_000 - l
                # replay the buffered tail causally: t = m+1 .. len(buf)
                for i in range(m, len(buf)):
                    step(buf[i][0], buf[i][1], i + 1)
                t = len(buf)
                buf = []
        else:
            t += 1
            step(day, int(c), t)

    state.update(
        (t, l, b, seas, [d for d, _ in buf], [c for _, c in buf])
    )
    if out_rows:
        yield pd.DataFrame(
            out_rows,
            columns=[
                "series", "day", "n_events", "fitted", "level", "trend", "seasonal",
            ],
        )


def streaming_holt_winters(stream: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Stateful streaming Holt-Winters over the (single-series) daily
    event-count stream: micro-batches carry pre-aggregated (day, c) rows
    (use foreachBatch / windowed counts upstream for the rollup); state
    holds the integer-micro recurrence. Emits one smoothed row per day
    once two init seasons have arrived — bit-equal to the batch
    operator's smoothed output."""
    daily = stream.selectExpr(
        "CAST(0 AS LONG) AS series",
        f"CAST(CAST({ts_col} AS DATE) AS STRING) AS day",
        "CAST(c AS LONG) AS c",
    )
    return daily.groupBy("series").applyInPandasWithState(
        _hw_fn,
        outputStructType=HW_OUT_SCHEMA_DDL,
        stateStructType=HW_STATE_SCHEMA_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

"""Holt-Winters additive triple exponential smoothing over a daily series.

The sequential recurrence (level/trend/seasonal) is the classic batch
forecasting primitive the reference family's analytics layer would add on
top of the star schema's fact table (SURVEY.md §2.K temporal extension);
the implementation follows the standard additive formulation (Holt 1957,
Winters 1960; Hyndman & Athanasopoulos, *Forecasting: Principles and
Practice*, §7.3).

Exactness contract: ALL state is integer micro-units and the smoothing
constants are fixed dyadic rationals (alpha=1/2, beta=1/4, gamma=1/4), so
every update is a pure integer expression — ``rha(p, q)``, round-half-away
integer division — and a DuckDB recursive CTE replays the whole trajectory
bit-for-bit. No floats enter any decision; the /1e6 display division
happens once at the end on both sides.

Scale shape: the distributed work is the daily COUNT(*) rollup (map-side
combinable, one shuffle on the bounded calendar axis). The recurrence is
inherently sequential in time, so it runs driver-side over the collected
day axis — a documented bounded collect (``max_points``), the same
contract as the PAV pool fold (operators/isotonic.py) and the bin-table
collect family. At 100 TB the day axis is still ~years of rows, not data-
sized."""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

HW_SCHEMA = StructType(
    [
        StructField("day", StringType()),
        StructField("n_events", LongType()),
        StructField("fitted", DoubleType()),
        StructField("level", DoubleType()),
        StructField("trend", DoubleType()),
        StructField("seasonal", DoubleType()),
        StructField("is_forecast", BooleanType()),
    ]
)


def rha(p: int, q: int) -> int:
    """Round-half-away integer division p/q (q > 0) — the SQL-replayable
    rounding shared with ``pq._micro_mean``: no float division anywhere
    near a tie decision."""
    return (2 * p + q) // (2 * q) if p >= 0 else -((-2 * p + q) // (2 * q))


def holt_winters_daily(
    events: DataFrame,
    ts_col: str = "ts",
    period: int = 7,
    horizon: int = 7,
    max_points: int = 100_000,
) -> DataFrame:
    """Fit additive Holt-Winters to the daily event-count series and emit
    one row per smoothed day (t > 2*period window start) plus ``horizon``
    forecast rows.

    Initialization (standard two-window init): level0 = mean of the first
    ``period`` observations, trend0 = (mean of window 2 - mean of window
    1) / period, seasonal_i = x_i - level0 for the first window. The
    update recurrence with alpha=1/2, beta=1/4, gamma=1/4 in integer
    micro-units::

        fitted_t = l + b + s_lag
        l'       = rha(x_t*1e6 - s_lag + l + b, 2)
        b'       = rha((l' - l) + 3*b, 4)
        s_slot'  = rha((x_t*1e6 - l') + 3*s_lag, 4)

    Output: (day, n_events, fitted, level, trend, seasonal, is_forecast);
    forecast rows carry NULL n_events and x̂(n+h) = l_n + h·b_n + s_lag.
    """
    daily = (
        events.groupBy(F.col(ts_col).cast("date").alias("day"))
        .agg(F.count("*").cast("long").alias("c"))
    )
    rows = sorted(
        ((r["day"], int(r["c"])) for r in daily.collect()), key=lambda t: t[0]
    )
    if len(rows) > max_points:
        raise ValueError(
            f"holt_winters_daily: day axis {len(rows)} exceeds max_points "
            f"{max_points} — the bounded-collect contract"
        )
    m = period
    if len(rows) < 2 * m + 1:
        # a series too short to initialize (two seasons + one update)
        # yields an EMPTY frame, not an exception — degenerate inputs
        # degrade, pipelines don't crash (and the SQL twin guards on the
        # same n >= 2m+1 condition, so both engines emit zero rows)
        return events.sparkSession.createDataFrame([], HW_SCHEMA)
    xs = [c for _, c in rows]
    sum1 = sum(xs[:m])
    sum2 = sum(xs[m : 2 * m])
    l = rha(sum1 * 1_000_000, m)
    b = rha((sum2 - sum1) * 1_000_000, m * m)
    # seasonal slots: slot i (0-based) last updated at the most recent day
    # t with (t-1) % m == i; initialized from window 1
    seas = [xs[i] * 1_000_000 - l for i in range(m)]

    out: list[tuple] = []
    for t in range(m + 1, len(rows) + 1):  # 1-based day index
        day, c = rows[t - 1]
        slot = (t - 1) % m
        s_lag = seas[slot]
        xm = c * 1_000_000
        fitted = l + b + s_lag
        l_new = rha(xm - s_lag + l + b, 2)
        b = rha((l_new - l) + 3 * b, 4)
        seas[slot] = rha((xm - l_new) + 3 * s_lag, 4)
        l = l_new
        out.append(
            (
                day.isoformat(),
                c,
                round(fitted / 1e6, 6),
                round(l / 1e6, 6),
                round(b / 1e6, 6),
                round(seas[slot] / 1e6, 6),
                False,
            )
        )
    n = len(rows)
    last_day = rows[-1][0]
    for h in range(1, horizon + 1):
        slot = (n + h - 1) % m
        fc = l + h * b + seas[slot]
        out.append(
            (
                (last_day + datetime.timedelta(days=h)).isoformat(),
                None,
                round(fc / 1e6, 6),
                round(l / 1e6, 6),
                round(b / 1e6, 6),
                round(seas[slot] / 1e6, 6),
                True,
            )
        )
    return events.sparkSession.createDataFrame(out, HW_SCHEMA)

"""Time-series smoothing / anomaly primitives on daily aggregates.

Extension family next to the window/rolling queries (SURVEY.md §2.G):
EWMA trend smoothing and seasonal (weekday-baseline) z-score anomaly
flagging — the two ops every metrics pipeline bolts onto its daily
rollups.

Cross-engine exactness strategy (the repo-wide contract):

- ``ewma_halflife1`` uses alpha = 1/2 with a finite ``window``-term memory,
  so every weight is an exact power of two; each ``count * 2^-j`` term and
  the 14-term sum are exact dyadic rationals well inside double precision —
  the sum is EXACT regardless of association order, and the final division
  of two exact doubles is correctly rounded. Bit-identical on any engine
  with no rounding guard needed. (The infinite-memory recursive EWMA is
  not order-free; the truncated form is what production metrics stacks run
  anyway — old terms decay below 2^-window.)
- ``weekday_zscore`` computes z = (n*x - sum) / sqrt(n*sumsq - sum^2) *
  sqrt(... ) entirely from INTEGER moments: one sqrt and one division on
  exact integer inputs are correctly rounded doubles, so the z-scores are
  bit-identical cross-engine before the 6-digit display rounding.

Scale: both are (groupBy day) -> (tiny per-day frame) -> window/self-join
on the day axis. The day axis is ~years*365 rows no matter how many
billions of raw events — the expensive shuffle is the FIRST daily rollup,
which partial-aggregates map-side; everything after is bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def daily_counts(
    events: DataFrame, ts: str = "ts", extra_keys: list[str] | None = None
) -> DataFrame:
    """Per-day event counts: ``(day, cnt)`` (+ extra grouping keys)."""
    keys = [F.to_date(ts).alias("day")] + [F.col(k) for k in (extra_keys or [])]
    return events.groupBy(*keys).agg(F.count("*").alias("cnt"))


def ewma_halflife1(
    daily: DataFrame,
    value: str = "cnt",
    day: str = "day",
    window: int = 14,
) -> DataFrame:
    """Truncated EWMA with half-life 1 observation (alpha = 1/2): for each
    day t (indexed over OBSERVED days), ``ewma = sum_{j=0..window-1}
    x_{t-j} * 2^-j / sum 2^-j`` over the days present in the window.

    The weight depends on the (current, contributing) index pair — a shape
    window frames cannot express — so each contributing day EXPLODES into
    ``window`` (target index, weight) rows and the rollup is an EQUI-join
    group-by on the target index (the wau_sliding_7d bounded fan-out
    pattern; a range self-join would be a nested-loop join). The fan-out
    is ``window`` rows per day of the tiny daily frame."""
    idx = daily.withColumn(
        "__t", F.row_number().over(Window.orderBy(F.col(day).asc())).cast("long")
    )
    contrib = idx.select(
        F.col("__t"), F.col(value).alias("__xj"),
        F.explode(F.sequence(F.lit(0), F.lit(int(window) - 1))).alias("__o"),
    ).select(
        (F.col("__t") + F.col("__o")).alias("__tt"),
        (F.col("__xj").cast("double") * F.pow(F.lit(0.5), F.col("__o").cast("double"))).alias("__wx"),
        F.pow(F.lit(0.5), F.col("__o").cast("double")).alias("__w"),
    )
    acc = contrib.groupBy("__tt").agg(
        F.sum("__wx").alias("__num"), F.sum("__w").alias("__den")
    )
    return (
        idx.join(acc, idx["__t"] == acc["__tt"])
        .select(F.col(day), F.col(value), (F.col("__num") / F.col("__den")).alias("ewma"))
    )


def weekday_zscore(
    daily: DataFrame,
    value: str = "cnt",
    day: str = "day",
    flag_at: float = 2.0,
) -> DataFrame:
    """Seasonal anomaly score: each day's value vs the population mean/std
    of ITS WEEKDAY across the whole history. Returns ``(day, weekday,
    value, z, is_anomaly)``.

    With integer moments n, s = sum, ss = sumsq per weekday and
    std_pop = sqrt(n*ss - s^2) / n, the z-score algebraically reduces to
    ``z = (n*x - s) / sqrt(n*ss - s^2)`` — one integer-radicand sqrt and
    one division, both correctly rounded, hence bit-identical on any
    engine. Days whose weekday has zero variance get z = NULL (no anomaly
    decidable)."""
    wd = daily.withColumn("weekday", F.dayofweek(day).cast("int"))
    mom = wd.groupBy("weekday").agg(
        F.count("*").alias("__n"),
        F.sum(value).alias("__s"),
        F.sum(F.col(value) * F.col(value)).alias("__ss"),
    )
    j = wd.join(F.broadcast(mom), "weekday")
    rad = F.col("__n") * F.col("__ss") - F.col("__s") * F.col("__s")
    # z = (x - s/n) / sqrt((n*ss - s^2)/n^2) = (n*x - s) / sqrt(n*ss - s^2)
    z = F.when(
        rad > 0,
        F.round(
            (F.col("__n") * F.col(value) - F.col("__s")).cast("double")
            / F.sqrt(rad.cast("double")),
            6,
        ),
    )
    return j.select(
        F.col(day),
        "weekday",
        F.col(value),
        z.alias("z"),
        (F.abs(z) > F.lit(float(flag_at))).alias("is_anomaly"),
    )

"""Temporal operators beyond the reference surface: as-of join and
gap-based sessionization (SURVEY.md §2.C notes these as driver-suite
extensions; the reference itself models time only via SCD2 intervals).

Both are pure DataFrame compositions:

- ``asof_join`` uses the union-and-carry-forward pattern, NOT a range join:
  tag both sides, union, and carry the right side's last value forward with
  a running ``max_by``-style window per key. One shuffle on (key), linear in
  input — at 100 TB this beats the naive correlated range join (which
  explodes to pairs) and is the standard scalable as-of technique.
- ``sessionize`` is the classic gap rule: a new session starts where the
  gap from the previous event exceeds the threshold; session ids are the
  running count of session starts. One window shuffle on the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
    tiebreak: str | None = None,
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """For each left row, attach the nearest right row on the chosen side
    (same key; ``backward``: right.ts <= left.ts takes the latest such row,
    ``forward``: right.ts >= left.ts takes the earliest). Left rows with no
    candidate keep NULLs — pandas ``merge_asof`` semantics, distributed.

    Implementation: union tagged frames, sort within key by ts (right rows
    adjacent to the boundary on the matching side of ties), carry right
    values across with a ``last``/``first``-ignorenulls running window,
    then keep left rows. Right-side columns come back suffixed.
    ``tiebreak`` (a right-side column) makes the winner among equal-ts right
    rows deterministic (highest value wins). ``tolerance`` (an INTERVAL
    string, e.g. ``"30 minutes"``) nulls out matches farther than that from
    the left timestamp — applied AFTER the carry, so it is a projection,
    not a join-shape change.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    right_cols = right_cols or [c for c in right.columns if c not in (key, ts)]
    lt = left.select(
        "*",
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
        F.lit(None).cast(right.schema[ts].dataType).alias("__r_ts"),
    )
    placeholder_left = [
        c for c in left.columns if c not in (key,)
    ]
    rt = right.select(
        F.col(key),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in placeholder_left],
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
        F.col(ts).alias("__r_ts"),
    ).withColumn(ts, F.col("__r_ts"))
    unioned = lt.unionByName(rt)
    if direction == "backward":
        # right rows sort before left rows at equal ts (__side 0 < 1), so a
        # same-timestamp right row IS visible to the left row (<= semantics)
        order = [F.col(ts).asc(), F.col("__side").asc()]
        if tiebreak is not None:
            order.append(F.col(f"__r_{tiebreak}").asc_nulls_first())
        frame = (Window.unboundedPreceding, Window.currentRow)
        pick = F.last
    else:
        # forward: right rows sort AFTER left rows at equal ts so the frame
        # [current, following] still sees them (>= semantics); among
        # equal-ts right rows the FIRST in order wins, so the tiebreak
        # column descends to keep "highest value wins" parity with backward
        order = [F.col(ts).asc(), F.col("__side").desc()]
        if tiebreak is not None:
            order.append(F.col(f"__r_{tiebreak}").desc_nulls_last())
        frame = (Window.currentRow, Window.unboundedFollowing)
        pick = F.first
    w = Window.partitionBy(key).orderBy(*order).rowsBetween(*frame)
    carried = unioned.select(
        "*",
        *[
            pick(f"__r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_cols
        ],
        pick("__r_ts", ignorenulls=True).over(w).alias(f"{ts}{suffix}"),
    )
    out = carried.filter(F.col("__side") == 1)
    if tolerance is not None:
        tol = F.expr(f"INTERVAL {tolerance}")
        within = (
            F.col(f"{ts}{suffix}").isNotNull()
            & (F.col(f"{ts}{suffix}") >= F.col(ts) - tol)
            & (F.col(f"{ts}{suffix}") <= F.col(ts) + tol)
        )
        for c in [*right_cols]:
            out = out.withColumn(
                f"{c}{suffix}", F.when(within, F.col(f"{c}{suffix}"))
            )
        out = out.withColumn(f"{ts}{suffix}", F.when(within, F.col(f"{ts}{suffix}")))
    return out.select(
        *left.columns, *[f"{c}{suffix}" for c in right_cols], f"{ts}{suffix}"
    )


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap: str = "30 minutes",
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Assign gap-based session indexes per key: a new session starts when
    the time since the previous event exceeds ``gap``. Adds ``session_id``
    (1-based per key) — the batch twin of a Structured Streaming session
    window."""
    order = [F.col(ts).asc()] + ([F.col(order_tiebreak).asc()] if order_tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    prev_ts = F.lag(ts).over(w)
    gap_expr = F.expr(f"INTERVAL {gap}")
    new_session = F.when(
        prev_ts.isNull() | (F.col(ts) > prev_ts + gap_expr), 1
    ).otherwise(0)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_id", F.sum(new_session).over(wsum))


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_start: str,
    right_end: str,
    bin_width_s: int = 3600,
    keys: list[str] | None = None,
) -> DataFrame:
    """Interval/range join at scale: match left rows whose ``left_ts`` falls
    in ``[right_start, right_end)``.

    The naive plan for ``l.ts BETWEEN r.start AND r.end`` is a broadcast
    nested-loop join — quadratic work and a broadcast of a whole side, which
    dies at 100 TB. This is the standard binning rewrite: quantize time into
    ``bin_width_s`` buckets, explode each right interval to the buckets it
    overlaps, then EQUI-join on (keys..., bucket) and re-check the exact
    predicate. Work is linear in rows x (interval_len / bin_width), the join
    is a plain shuffled hash join, and AQE/skew handling apply. Choose
    ``bin_width_s`` ~= typical interval length so replication stays O(1).
    """
    binl = F.floor(F.unix_timestamp(F.col(left_ts)) / bin_width_s)
    bins = F.sequence(
        F.floor(F.unix_timestamp(F.col(right_start)) / bin_width_s),
        F.floor(F.unix_timestamp(F.col(right_end)) / bin_width_s),
    )
    lb = left.withColumn("__bin", binl)
    rb = right.withColumn("__bin", F.explode(bins))
    on = ["__bin"] + (keys or [])
    return (
        lb.join(rb, on)
        .filter(
            (F.col(left_ts) >= F.col(right_start)) & (F.col(left_ts) < F.col(right_end))
        )
        .drop("__bin")
    )


def merge_intervals(
    df: DataFrame,
    key: str,
    start: str,
    end: str,
) -> DataFrame:
    """Coalesce overlapping/touching ``[start, end)`` intervals per key into
    maximal merged intervals — the classic gaps-and-islands rewrite, and the
    primitive behind uptime/coverage/sessionized-duration reporting.

    One shuffle (the per-key sort window): an interval starts a new island
    when its start exceeds the running max of all previous ends; the island
    id is the running count of such breaks; a second aggregation per
    (key, island) emits the merged bounds. No self-join, no explode — cost
    is the sort, linear in rows. Ties/adjacency (`start == prev_end`) merge,
    matching half-open interval semantics.
    """
    w = Window.partitionBy(key).orderBy(F.col(start), F.col(end))
    prev_max_end = F.max(end).over(w.rowsBetween(Window.unboundedPreceding, -1))
    breaks = F.when(
        prev_max_end.isNull() | (F.col(start) > prev_max_end), 1
    ).otherwise(0)
    islands = df.withColumn(
        "__island", F.sum(breaks).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        islands.groupBy(key, "__island")
        .agg(
            F.min(start).alias("merged_start"),
            F.max(end).alias("merged_end"),
            F.count("*").alias("n_source_intervals"),
        )
        .drop("__island")
    )


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bin_width_s: int = 3600,
    keys: list[str] | None = None,
) -> DataFrame:
    """Interval x interval OVERLAPS join at scale: pairs where
    ``[l_start, l_end)`` and ``[r_start, r_end)`` intersect.

    Same binning rewrite as :func:`range_join_binned`, applied to BOTH
    sides: each interval explodes to the buckets it covers, pairs meet on
    an equi-join over (keys..., bucket), and the exact overlap predicate
    re-checks. A pair that shares several buckets is emitted exactly once —
    only from the bucket where the overlap *starts*
    (``floor(max(l_start, r_start) / bin_width)``), so no post-join
    dedup is needed and genuinely duplicate input rows are preserved
    (a full-row ``dropDuplicates`` would silently collapse them).
    Work is linear in rows x (interval_len / bin_width) per side — never
    the quadratic nested-loop the naive OVERLAPS predicate plans.
    """
    def bins(s: str, e: str):
        return F.sequence(
            F.floor(F.unix_timestamp(F.col(s)) / bin_width_s),
            F.floor(F.unix_timestamp(F.col(e)) / bin_width_s),
        )

    lb = left.withColumn("__bin", F.explode(bins(left_start, left_end)))
    rb = right.withColumn("__bin", F.explode(bins(right_start, right_end)))
    on = ["__bin"] + (keys or [])
    overlap_start_bin = F.floor(
        F.unix_timestamp(F.greatest(F.col(left_start), F.col(right_start)))
        / bin_width_s
    )
    return (
        lb.join(rb, on)
        .filter(
            (F.col(left_start) < F.col(right_end))
            & (F.col(right_start) < F.col(left_end))
            # emit each overlapping pair from exactly one bucket
            & (F.col("__bin") == overlap_start_bin)
        )
        .drop("__bin")
    )


def session_ngrams(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    step_col: str = "event_type",
    n: int = 3,
    gap: str = "30 minutes",
    order_tiebreak: str | None = "event_id",
) -> DataFrame:
    """Sequential pattern mining, n-gram tier: every length-``n`` run of
    consecutive steps within a session, as ``(path, n_occurrences)``.

    The standard "what do users do next" / clickstream-path rollup: far
    cheaper than full sequence mining (PrefixSpan) and usually what the
    product question needs. Composes :func:`sessionize` (gap rule) with
    ``lead`` window steps — ONE shuffle on the session key partitions both
    the sessionization and the leads; the n-gram rollup partial-aggregates
    map-side. Paths that would cross a session boundary are suppressed by
    leading the session_id alongside the step column.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    s = sessionize(df, key=key, ts=ts, gap=gap, order_tiebreak=order_tiebreak)
    order = [F.col(ts).asc()] + (
        [F.col(order_tiebreak).asc()] if order_tiebreak else []
    )
    w = Window.partitionBy(key).orderBy(*order)
    steps = [F.col(step_col)] + [F.lead(step_col, i).over(w) for i in range(1, n)]
    same_session = [
        F.lead("session_id", i).over(w) == F.col("session_id") for i in range(1, n)
    ]
    ok = F.lit(True)  # n == 1: every single step is trivially within-session
    for c in same_session:
        ok = ok & c
    return (
        s.withColumn("__path", F.when(ok, F.concat_ws(">", *steps)))
        .filter(F.col("__path").isNotNull())
        .groupBy(F.col("__path").alias("path"))
        .agg(F.count("*").alias("n_occurrences"))
    )

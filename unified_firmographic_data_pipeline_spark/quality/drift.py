"""Dataset drift detection — the between-runs sibling of the profiler.

An incremental pipeline (reference analogue: the scheduled DAG re-landing
the same feeds daily) needs to notice when today's load stops looking like
yesterday's: columns appearing/disappearing/retyping (schema drift) and
value distributions shifting (data drift). Standard instruments, built
Spark-first:

- ``schema_drift`` compares two schemas structurally — pure metadata,
  zero data scanned.
- ``numeric_psi`` / ``categorical_psi`` compute the Population Stability
  Index, the industry-standard drift score: bucket both datasets on a
  SHARED axis derived from the reference side, compare proportions,
  ``PSI = Σ (p_cur − p_ref) · ln(p_cur / p_ref)``. Rule of thumb:
  < 0.1 stable, 0.1–0.25 moderate shift, > 0.25 drifted.

The oracle-checked registered variant is ``psi_drift_sources``
(``plans/driver_queries.py``, batch 44): decile edges, fully in-plan,
bit-exact vs DuckDB. This module is the reusable API around it —
configurable equi-width buckets, the categorical axis, and the schema
diff, none of which fit a fixed-oracle query shape.

Scale design (100 TB): each PSI is one bounded groupBy per side (output =
``bins`` or ``top_k + 1`` rows — constants), merged driver-side over tiny
frames. The bucket axis comes from the REFERENCE frame only, so the
current frame is never scanned twice; smoothing (``eps``) keeps ln finite
when a bucket empties on one side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def schema_drift(before: DataFrame, after: DataFrame) -> DataFrame:
    """Structural diff of two schemas -> rows of
    ``(column, change, before_type, after_type)`` where ``change`` is one
    of ``added`` / ``removed`` / ``retyped``. Unchanged columns are
    omitted; zero rows = schemas compatible. Metadata-only: no job runs."""
    b = {f.name: f.dataType.simpleString() for f in before.schema.fields}
    a = {f.name: f.dataType.simpleString() for f in after.schema.fields}
    rows = []
    for name in sorted(b.keys() | a.keys()):
        if name not in a:
            rows.append((name, "removed", b[name], None))
        elif name not in b:
            rows.append((name, "added", None, a[name]))
        elif a[name] != b[name]:
            rows.append((name, "retyped", b[name], a[name]))
    spark = before.sparkSession
    return spark.createDataFrame(
        rows, "column string, change string, before_type string, after_type string"
    )


def _bucket_props(df: DataFrame, column: str, lo: float, hi: float, bins: int):
    """Per-bucket row proportions on the shared [lo, hi] axis; out-of-range
    values fold into the edge buckets (bucket 1 / ``bins``) so current-frame
    outliers register as edge mass instead of silently dropping. NULLs are
    excluded (completeness drift belongs to the profiler, not PSI)."""
    dc = F.col(column).cast("double")
    bucket = F.greatest(
        F.lit(1),
        F.least(
            F.expr(f"width_bucket(cast({column} as double), {lo!r}, {hi!r}, {bins})"),
            F.lit(bins),
        ),
    ).cast("int")
    counts = (
        df.where(dc.isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    total = sum(r.n for r in counts) or 1
    return {r.bucket: r.n / total for r in counts}


def numeric_psi(
    reference: DataFrame,
    current: DataFrame,
    column: str,
    bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """PSI of a numeric column over ``bins`` equi-width buckets spanning
    the REFERENCE min/max (current-frame outliers fold into the edge
    buckets — a mass shift past the reference range is drift, and shows up
    there). Returns one row per bucket
    ``(bucket, lo, hi, p_ref, p_cur, psi_term)``; ``sum(psi_term)`` is the
    PSI. A reference frame with no non-null values raises — there is
    nothing to be stable against."""
    if bins < 2:
        raise ValueError("bins must be >= 2")
    mm = reference.agg(
        F.min(F.col(column).cast("double")).alias("lo"),
        F.max(F.col(column).cast("double")).alias("hi"),
    ).collect()[0]
    if mm.lo is None:
        raise ValueError(f"reference[{column!r}] has no non-null values")
    lo, hi = float(mm.lo), float(mm.hi)
    if lo == hi:
        hi = lo + 1.0  # degenerate constant reference: one bucket holds all
    p_ref = _bucket_props(reference, column, lo, hi, bins)
    p_cur = _bucket_props(current, column, lo, hi, bins)
    width = (hi - lo) / bins
    import math

    rows = []
    for b in range(1, bins + 1):
        pr = p_ref.get(b, 0.0) + eps
        pc = p_cur.get(b, 0.0) + eps
        rows.append(
            (
                b,
                lo + (b - 1) * width,
                lo + b * width,
                p_ref.get(b, 0.0),
                p_cur.get(b, 0.0),
                (pc - pr) * math.log(pc / pr),
            )
        )
    return reference.sparkSession.createDataFrame(
        rows,
        "bucket int, lo double, hi double, p_ref double, p_cur double, psi_term double",
    )


def categorical_psi(
    reference: DataFrame,
    current: DataFrame,
    column: str,
    top_k: int = 20,
    eps: float = 1e-6,
) -> DataFrame:
    """PSI of a categorical column over the reference's ``top_k`` most
    frequent values plus an ``__other__`` bucket (bounded axis — a
    high-cardinality column cannot blow up the report; new categories in
    the current frame land in ``__other__``, which is exactly the drift
    signal they are). NULL is its own category (``__null__``): a
    completeness shift IS distribution drift here. Returns
    ``(value, p_ref, p_cur, psi_term)``."""
    norm = lambda df: df.select(  # noqa: E731
        F.coalesce(F.col(column).cast("string"), F.lit("__null__")).alias("v")
    )
    top = [
        r.v
        for r in norm(reference)
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("v"))
        .limit(top_k)
        .collect()
    ]

    def props(df: DataFrame) -> dict[str, float]:
        # __null__ is ALWAYS its own bucket even when absent from the
        # reference top-k — a completeness shift must never hide in
        # __other__
        bucket = F.when(
            F.col("v").isin(top) | (F.col("v") == "__null__"), F.col("v")
        ).otherwise("__other__")
        counts = (
            norm(df)
            .select(bucket.alias("b"))
            .groupBy("b")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        total = sum(r.n for r in counts) or 1
        return {r.b: r.n / total for r in counts}

    p_ref, p_cur = props(reference), props(current)
    import math

    rows = []
    for v in sorted(set(p_ref) | set(p_cur)):
        pr = p_ref.get(v, 0.0) + eps
        pc = p_cur.get(v, 0.0) + eps
        rows.append((v, p_ref.get(v, 0.0), p_cur.get(v, 0.0), (pc - pr) * math.log(pc / pr)))
    return reference.sparkSession.createDataFrame(
        rows, "value string, p_ref double, p_cur double, psi_term double"
    )


def json_key_drift(
    before: DataFrame,
    after: DataFrame,
    json_col: str,
) -> DataFrame:
    """DATA-level twin of :func:`schema_drift` for semi-structured
    payloads — the drift the reference's VARIANT design exists to absorb
    (RM:20, RM:46: JSON chosen for schema-drift tolerance; this is the
    detector that makes the tolerance observable instead of silent).

    Explodes every top-level JSON key per row (``json_object_keys`` —
    JVM-side, no UDF) on both frames and diffs per-key OCCURRENCE:
    ``(key, before_n, after_n, status, rate_delta_micro)`` where status
    is ``added`` / ``removed`` / ``stable`` and ``rate_delta_micro`` is
    the micro-quantized difference of per-row occurrence rates (each
    rate rounds to integer micros BEFORE the diff, so the number is
    engine-exact).

    Dirty payloads are FIRST-CLASS, not dropped — a drift auditor's
    whole domain is rows that stopped parsing (round-8 verdict): every
    row lands in exactly one bucket — its real keys, or one of three
    sentinel keys ``__null__`` (SQL NULL payload), ``__malformed__``
    (non-NULL string that fails the strict ``json_valid`` gate —
    :func:`functions.cleaning.json_strict_valid`, the DuckDB-parity
    validator), or ``__nonobject__`` (valid JSON that is not an object:
    array / scalar / JSON null). A parse-rate collapse therefore shows
    up as an ``added``/rate-shifted ``__malformed__`` row instead of
    vanishing. (Only a valid ``{}`` contributes no row — no keys is not
    drift.) Sentinels can collide with real keys of the same name;
    callers with such payloads should rename the sentinels.

    Empty frames are defined: a zero-row side contributes rate 0 for
    every key (guarded division — ANSI would otherwise raise on
    ``round(0/0)``) and the diff is driven by the other side.

    Scale shape: one key-explode + one bounded groupBy per side (output
    = distinct-key rows + ≤3 sentinels, a schema-sized axis, never
    data-sized); the per-side row counts ride 1-row broadcasts; the
    diff is a full-outer join of two key-axis frames."""
    from unified_firmographic_data_pipeline_spark.functions.cleaning import (
        json_strict_valid,
    )

    def keyed(df: DataFrame, alias: str) -> DataFrame:
        c = F.col(json_col)
        obj_keys = F.json_object_keys(c)  # NULL when valid but not an object
        bucket = (
            F.when(c.isNull(), F.array(F.lit("__null__")))
            .when(~json_strict_valid(c), F.array(F.lit("__malformed__")))
            .when(obj_keys.isNull(), F.array(F.lit("__nonobject__")))
            .otherwise(obj_keys)
        )
        keys = df.select(F.explode(bucket).alias("key"))
        return keys.groupBy("key").agg(F.count("*").alias(alias))

    b = keyed(before, "before_n")
    a = keyed(after, "after_n")
    bt = before.agg(F.count("*").alias("bn"))
    at = after.agg(F.count("*").alias("an"))
    joined = (
        b.join(a, "key", "full_outer").crossJoin(bt).crossJoin(at)
    )

    def rate_micro(n: F.Column, tot: F.Column) -> F.Column:
        return F.when(tot == 0, F.lit(0).cast("long")).otherwise(
            F.round(
                F.coalesce(n, F.lit(0)).cast("double") / tot.cast("double") * 1e6
            ).cast("long")
        )

    status = (
        F.when(F.col("before_n").isNull(), F.lit("added"))
        .when(F.col("after_n").isNull(), F.lit("removed"))
        .otherwise(F.lit("stable"))
    )
    return joined.select(
        "key",
        F.coalesce("before_n", F.lit(0)).cast("long").alias("before_n"),
        F.coalesce("after_n", F.lit(0)).cast("long").alias("after_n"),
        status.alias("status"),
        (
            rate_micro(F.col("after_n"), F.col("an"))
            - rate_micro(F.col("before_n"), F.col("bn"))
        ).alias("rate_delta_micro"),
    )

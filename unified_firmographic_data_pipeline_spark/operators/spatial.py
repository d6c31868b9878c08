"""Spatial grid-bucketed joins — geohash/S2-cell bucketing re-expressed
as integer-cell equi-joins (the only spatial-join shape that survives
100 TB: candidates come from a point's 3x3 cell neighborhood, never
point x point).

Exactness contract: coordinates are INTEGER centi-degrees, cells are
FLOOR divisions (signed-coordinate-safe, matching SQL ``//`` — round-7
ADVICE #4), and distances are integer squared centi-degrees — no
trig, no floats anywhere, so a SQL twin replays every result bit-for-bit
(haversine is a drop-in for the distance expression once an approximate
contract is acceptable; the JOIN SHAPE — the scale-relevant part — is
identical either way).

Correctness bound: with cell size C and radius R <= C, the 3x3
neighborhood of a probe's cell fully covers its radius-R disk, so
radius queries are EXACT (no missed candidates); nearest-neighbor is
exact whenever the true nearest lies within the neighborhood (the
radius-bound contract callers accept when they pick C).

Scale shape: the probe side explodes x9 (map-side, no extra input
pass); both sides shuffle on uniform (gy, gx) cell keys; per-probe
reductions (argmin / counts) are cell-local windows or aggregations."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def _floor_div(col: Column, divisor: int) -> Column:
    """Floor division (rounds toward -inf, like SQL ``//``). The double
    detour is exact here: centi-degree coordinates are far below 2^52."""
    return F.floor(col / F.lit(divisor)).cast("long")


def with_grid_cell(
    df: DataFrame, lat_col: str, lon_col: str, cell_size: int = 100
) -> DataFrame:
    """Append integer grid-cell ids (gy, gx) = (lat // C, lon // C) —
    FLOOR division, so negative (signed lat/lon) coordinates bucket the
    same way a SQL twin's ``//`` does; Spark's ``div`` truncates toward
    zero, which would make cell 0 double-width and diverge from the
    oracle for real-world coordinates (round-7 ADVICE #4).
    Coordinates must be integer (centi-degree) columns."""
    return df.select(
        "*",
        _floor_div(F.col(lat_col), cell_size).alias("gy"),
        _floor_div(F.col(lon_col), cell_size).alias("gx"),
    )


def grid_candidates(
    probes: DataFrame,
    sites: DataFrame,
    probe_lat: str = "plat",
    probe_lon: str = "plon",
    site_lat: str = "slat",
    site_lon: str = "slon",
    cell_size: int = 100,
) -> DataFrame:
    """All (probe, site) pairs whose cells are within Chebyshev distance
    1 — the 3x3-neighborhood candidate set, with the exact integer
    squared distance ``dist2`` attached. Probe rows explode x9; the join
    is an equi-join on (gy, gx)."""
    offs = F.array(*[F.lit(d) for d in (-1, 0, 1)])
    p = (
        probes.select("*", F.explode(offs).alias("__dy"))
        .select("*", F.explode(offs).alias("__dx"))
        .select(
            *probes.columns,
            (_floor_div(F.col(probe_lat), cell_size) + F.col("__dy")).alias("gy"),
            (_floor_div(F.col(probe_lon), cell_size) + F.col("__dx")).alias("gx"),
        )
    )
    s = with_grid_cell(sites, site_lat, site_lon, cell_size)
    dlat = F.col(probe_lat) - F.col(site_lat)
    dlon = F.col(probe_lon) - F.col(site_lon)
    return p.join(s, ["gy", "gx"]).select(
        *probes.columns,
        *sites.columns,
        (dlat * dlat + dlon * dlon).alias("dist2"),
    )


def grid_nearest(
    cand: DataFrame, probe_key: str, site_key: str
) -> DataFrame:
    """Per-probe nearest site from a candidate set: argmin by
    (dist2, site_key) — a probe-keyed window, cell-local by
    construction. Probes with an empty candidate set drop out (the
    radius-bound contract)."""
    w = Window.partitionBy(probe_key).orderBy(
        F.col("dist2").asc(), F.col(site_key).asc()
    )
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def grid_radius_counts(
    probes: DataFrame,
    cand: DataFrame,
    probe_key: str,
    radius: int,
) -> DataFrame:
    """Per-probe count of sites within ``radius`` (exact for
    radius <= cell_size — see module contract): ``(probe_key,
    n_within)``, INCLUDING zero-count probes (left join back to the full
    probe set, the difference between "no site nearby" and "dropped")."""
    hits = (
        cand.filter(F.col("dist2") <= radius * radius)
        .groupBy(probe_key)
        .agg(F.count("*").cast("long").alias("n_within"))
    )
    return probes.select(probe_key).join(hits, probe_key, "left").select(
        probe_key, F.coalesce(F.col("n_within"), F.lit(0)).cast("long").alias("n_within")
    )

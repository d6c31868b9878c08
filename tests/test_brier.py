"""Brier score + Murphy decomposition (driver query
brier_score_decomposition): the identity brier = reliability -
resolution + uncertainty, pinned with exact rational arithmetic."""

from __future__ import annotations

from fractions import Fraction

from unified_firmographic_data_pipeline_spark.plans.driver_queries import QUERIES


def test_brier_identity_exact_fractions(spark, sf_small):
    row = QUERIES["brier_score_decomposition"](spark, sf_small).first()
    # recompute all four from the raw table with exact rationals
    import duckdb

    g = duckdb.sql(
        f"""SELECT o_orderpriority, COUNT(*) AS n,
                   SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS pos
            FROM '{sf_small}/orders.parquet' GROUP BY 1"""
    ).fetchall()
    n_tot = sum(n for _, n, _ in g)
    pos_tot = sum(p for _, _, p in g)
    ybar = Fraction(pos_tot, n_tot)
    brier = rel = res = Fraction(0)
    for _, n, pos in g:
        p = Fraction(pos + 1, n + 2)
        yk = Fraction(pos, n)
        brier += n * p * p - 2 * p * pos + pos
        rel += n * (p - yk) ** 2
        res += n * (yk - ybar) ** 2
    brier, rel, res = brier / n_tot, rel / n_tot, res / n_tot
    unc = ybar * (1 - ybar)
    # Murphy's identity holds exactly in rationals
    assert brier == rel - res + unc
    # and the engine's micro-quantized outputs match to their 6dp contract
    assert abs(row["brier"] - float(brier)) < 2e-6
    assert abs(row["reliability"] - float(rel)) < 2e-6
    assert abs(row["resolution"] - float(res)) < 2e-6
    assert abs(row["uncertainty"] - float(unc)) < 2e-6

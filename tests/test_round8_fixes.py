"""Round-8 regression tests for the round-7 ADVICE items and the
simhash_near_pairs_md5 shape rewrite (round-7 verdict item #1):

1. streaming Holt-Winters defers first emit to 2m+1 days (batch parity),
2. token_chunks yields NO chunks for a 0-length token array,
3. pq_adc_topk filters malformed query vectors like its oracle,
4. spatial grid cells use floor division (signed-coordinate safe),
5. the 60-bit md5 SimHash: Column fold == agg-shaped fingerprints,
   and the pair operator still finds planted near-dups only.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from unified_firmographic_data_pipeline_spark.operators.curation import token_chunks
from unified_firmographic_data_pipeline_spark.operators.holtwinters import (
    holt_winters_daily,
)
from unified_firmographic_data_pipeline_spark.operators.neardup import (
    simhash_md5,
    simhash_md5_fingerprints,
    simhash_near_pairs_md5,
)
from unified_firmographic_data_pipeline_spark.operators.spatial import (
    grid_candidates,
    grid_nearest,
    with_grid_cell,
)


# ------------------------------------------------- 1. streaming HW boundary
def _run_hw_stream(spark, tmp_path, days, counts, tag):
    from unified_firmographic_data_pipeline_spark.streaming.stateful import (
        streaming_holt_winters,
    )

    src = str(tmp_path / f"src_{tag}")
    out = str(tmp_path / f"out_{tag}")
    ckpt = str(tmp_path / f"ckpt_{tag}")
    sch = "ts timestamp, c long"
    spark.createDataFrame(list(zip(days, counts)), sch).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q = (
        streaming_holt_winters(spark.readStream.schema(sch).parquet(src))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out).collect()


def test_streaming_hw_emits_nothing_at_exactly_14_days(spark, tmp_path):
    """Batch returns an empty frame for n < 2m+1 = 15; a stream that ENDS
    at exactly 14 days must emit nothing too (round-7 ADVICE #1)."""
    days = [
        datetime.datetime(2024, 5, 1) + datetime.timedelta(days=i) for i in range(14)
    ]
    counts = [100 + 5 * i for i in range(14)]
    assert _run_hw_stream(spark, tmp_path, days, counts, "d14") == []


def test_streaming_hw_15th_day_emits_batch_equal_replay(spark, tmp_path):
    """The 15th day triggers init + causal replay: rows for t=8..15,
    bit-equal to the batch operator on the same series."""
    n = 15
    days = [
        datetime.datetime(2024, 5, 1) + datetime.timedelta(days=i) for i in range(n)
    ]
    counts = [100 + 5 * i + (i % 7) for i in range(n)]
    rows = _run_hw_stream(spark, tmp_path, days, counts, "d15")
    batch = holt_winters_daily(
        spark.createDataFrame(
            [(d,) for d, c in zip(days, counts) for _ in range(c)], "ts timestamp"
        )
    )
    expected = {
        r["day"]: (r["n_events"], r["fitted"], r["level"], r["trend"], r["seasonal"])
        for r in batch.collect()
        if not r["is_forecast"]
    }
    got = {
        r["day"]: (r["n_events"], r["fitted"], r["level"], r["trend"], r["seasonal"])
        for r in rows
    }
    assert got == expected
    assert len(got) == n - 7


# -------------------------------------------- 2. token_chunks empty arrays
def test_token_chunks_zero_length_array_yields_no_chunks(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b", "c"]), (2, []), (3, None)], "id long, toks array<string>"
    )
    out = {
        r["id"]: r["c"]
        for r in df.select(
            "id", token_chunks("toks", width=2, pre_tokenized=True).alias("c")
        ).collect()
    }
    assert out[1] == ["a b", "c"]
    assert out[2] == []  # was ONE md5('')-able empty chunk before the fix
    assert out[3] in (None, [])  # NULL input never fabricates a chunk
    # and explode() therefore drops chunkless docs, like generate_series(0,-1)
    n = (
        df.select("id", F.explode(token_chunks("toks", 2, pre_tokenized=True)))
        .filter(F.col("id") >= 2)
        .count()
    )
    assert n == 0


def test_token_chunks_single_empty_token_still_one_chunk(spark):
    """tokens('') is [''] in BOTH engines (split never yields []), so the
    1-element empty-string array keeps producing exactly one chunk."""
    df = spark.createDataFrame([([""],)], "toks array<string>")
    out = df.select(token_chunks("toks", 2, pre_tokenized=True).alias("c")).collect()
    assert out[0]["c"] == [""]


# ------------------------------------------------ 3. pq_adc_topk validity
def test_pq_adc_topk_drops_malformed_query_vectors(spark, tmp_path):
    """A malformed vector inside the query-id range must produce NO ranked
    rows (the oracle filters it; Spark previously emitted 5 all-NULL-ADC
    rows via asc_nulls_last)."""
    import random

    from unified_firmographic_data_pipeline_spark.plans import driver_queries as dq

    rng = random.Random(8)
    rows = []
    for vid in range(20):
        vec = [round(rng.uniform(-1, 1), 4) for _ in range(64)]
        rows.append((vid, vid % 3, vec))
    # vec_id 2 is malformed: short vector (would crash/NULL the ADC path)
    rows[2] = (2, 2, [0.5, 0.5])
    spark.createDataFrame(
        rows, "vec_id long, label long, embedding array<double>"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    # the query reads <sf_dir>/embeddings.parquet; only this table is used
    out = dq.QUERIES["pq_adc_topk"](spark, str(tmp_path)).collect()
    qids = {r["query_id"] for r in out}
    assert 2 not in qids
    assert qids == {0, 1, 3, 4}
    assert all(r["adc_dist_micro"] is not None for r in out)


# ---------------------------------------------- 4. spatial floor division
def test_grid_cell_floor_division_negative_coordinates(spark):
    df = spark.createDataFrame(
        [(-150, -1), (-100, -100), (-1, 1), (0, 99), (100, 101)],
        "lat long, lon long",
    )
    got = {
        (r["lat"], r["lon"]): (r["gy"], r["gx"])
        for r in with_grid_cell(df, "lat", "lon", 100).collect()
    }
    # floor semantics: -150//100 = -2 (Spark `div` would give -1)
    assert got[(-150, -1)] == (-2, -1)
    assert got[(-100, -100)] == (-1, -1)
    assert got[(-1, 1)] == (-1, 0)
    assert got[(0, 99)] == (0, 0)
    assert got[(100, 101)] == (1, 1)


def test_grid_nearest_exact_for_signed_coordinates(spark):
    """Brute-force parity on a signed-coordinate fixture — truncation
    toward zero would make cell 0 double-width and miss candidates that
    floor division finds."""
    import random

    rng = random.Random(88)
    probes = [(i, rng.randint(-500, 500), rng.randint(-500, 500)) for i in range(60)]
    sites = [(j, rng.randint(-500, 500), rng.randint(-500, 500)) for j in range(40)]
    p = spark.createDataFrame(probes, "pid long, plat long, plon long")
    s = spark.createDataFrame(sites, "sid long, slat long, slon long")
    cand = grid_candidates(p, s, cell_size=100)
    got = {
        r["pid"]: (r["sid"], r["dist2"])
        for r in grid_nearest(cand, "pid", "sid").collect()
    }
    for pid, plat, plon in probes:
        best = min(
            ((sid, (plat - slat) ** 2 + (plon - slon) ** 2) for sid, slat, slon in sites),
            key=lambda t: (t[1], t[0]),
        )
        # grid_nearest is exact whenever the true nearest is inside the
        # 3x3 neighborhood (Chebyshev distance <= cell_size)
        if best[1] <= 100 * 100 and pid in got:
            assert got[pid] == best, f"probe {pid}"


# ----------------------------------------------- 5. simhash 60-bit rewrite
def test_simhash_md5_column_fold_equals_agg_fingerprints(spark):
    texts = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "completely different content with other words entirely"),
        (4, "singleword"),
        (5, ""),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    fold = {
        r["doc_id"]: r["fp"]
        for r in df.select("doc_id", simhash_md5("text", 60).alias("fp")).collect()
    }
    agg = {
        r["doc_id"]: r["__fp"]
        for r in simhash_md5_fingerprints(df, "doc_id", "text", 60).collect()
    }
    assert fold == agg
    # 60-bit contract: every fingerprint fits a signed BIGINT, always >= 0
    assert all(0 <= v < (1 << 60) for v in fold.values())


def test_simhash_near_pairs_md5_matches_bruteforce_hamming(spark):
    """The pigeonhole block join must return EXACTLY the pairs a brute
    force over the fingerprints finds within the radius (the pigeonhole
    guarantee: <=3 differing bits across 4 blocks leaves >=1 equal
    block). Docs 1 and 2 are identical (hamming 0), so the expected set
    is provably nonempty."""
    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    rows = [
        (1, base),
        (2, base),
        (3, base + " kilo lima"),
        (4, "zz yy xx ww vv uu tt ss rr qq pp oo nn mm ll kk jj ii hh gg"),
        (5, "one two three four five six seven eight nine ten"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {
        r["doc_id"]: r["__fp"]
        for r in simhash_md5_fingerprints(df, "doc_id", "text", 60).collect()
    }
    ids = sorted(fps)
    expected = {
        (a, b): bin(fps[a] ^ fps[b]).count("1")
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(fps[a] ^ fps[b]).count("1") <= 3
    }
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_pairs_md5(df, max_hamming=3, bits=60).collect()
    }
    assert (1, 2) in expected
    assert got == expected


def test_simhash_near_pairs_md5_randomized_bruteforce(spark):
    """Pigeonhole completeness on a seeded random corpus: 40 docs drawn
    from a 20-word vocab (dense fingerprint space, many near-collisions)
    — the operator's pair set must equal brute force over the
    fingerprints at every radius the block design covers."""
    import random

    rng = random.Random(608)
    vocab = [f"w{i}" for i in range(20)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 30))))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {
        r["doc_id"]: r["__fp"]
        for r in simhash_md5_fingerprints(df, "doc_id", "text", 60).collect()
    }
    ids = sorted(fps)
    for radius in (1, 3):
        expected = {
            (a, b): bin(fps[a] ^ fps[b]).count("1")
            for i, a in enumerate(ids)
            for b in ids[i + 1 :]
            if bin(fps[a] ^ fps[b]).count("1") <= radius
        }
        got = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in simhash_near_pairs_md5(
                df, max_hamming=radius, bits=60
            ).collect()
        }
        assert got == expected, f"radius {radius}"
        assert expected, f"radius {radius}: degenerate fixture (no pairs)"

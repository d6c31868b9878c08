"""Materialized IVF-SQ index: partition pruning is a filesystem fact
(inputFiles only touch probed list directories), and results are
bit-identical to the inline sq_topk_ivf with the same parameters."""

from __future__ import annotations

import pytest

from unified_firmographic_data_pipeline_spark.operators.ann_index import (
    build_ivf_sq_index,
    load_index_meta,
    search_ivf_sq_index,
)
from unified_firmographic_data_pipeline_spark.operators.pq import l2_normalized

# heavy property sweep / e2e tier (see pytest.ini): excluded from the
# default driver-window run, executed by the full tier at close-out
pytestmark = pytest.mark.slow


SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    from unified_firmographic_data_pipeline_spark.plans.driver_queries import _t

    return _t(spark, SF, "embeddings").select("vec_id", "embedding")


@pytest.fixture(scope="module")
def index(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivfsq") / "idx")
    norm = l2_normalized(emb)
    meta = build_ivf_sq_index(norm, path, n_lists=8)
    return path, meta, norm


def test_index_layout_and_meta(index):
    import os

    path, meta, _ = index
    assert meta["n_lists"] == 8 and len(meta["bounds"]) == 64
    assert len(meta["centroids"]) == 8
    lists = sorted(
        d for d in os.listdir(os.path.join(path, "data")) if d.startswith("list=")
    )
    assert len(lists) >= 2  # clustered fixture spreads over several lists
    assert load_index_meta(path)["dim"] == 64


def test_search_reads_only_probed_partitions(spark, index):
    """The scan-reduction contract, physically: the probe-union filter
    lands in the scans' PartitionFilters (directories skipped at
    planning — the same assertion style as test_partition_pruning), for
    BOTH index scans (codes and re-rank vectors). inputFiles() cannot
    be used here: it lists the relation before pruning."""
    import contextlib
    import io

    path, meta, norm = index
    q = norm.filter("vec_id < 3")
    got = search_ivf_sq_index(spark, path, q, k=5, n_probe=2, shortlist=20)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        got.explain("formatted")
    plan = buf.getvalue()
    pf_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    pruned = [l for l in pf_lines if "list" in l and "IN" in l.upper()]
    assert len(pruned) >= 2, pf_lines  # codes scan + vectors re-rank scan
    # and the probe union is strictly smaller than n_lists on this data
    from pyspark.sql import functions as F

    from unified_firmographic_data_pipeline_spark.operators.ann_index import (
        _probe_lists_expr,
    )

    probes = _probe_lists_expr(
        [(c, v) for c, v in meta["centroids"]], 2, "embedding"
    )
    probed = {
        r["p"] for r in q.select(F.explode(probes).alias("p")).distinct().collect()
    }
    assert len(probed) < meta["n_lists"], "probe union must actually prune"
    assert len(got.collect()) == 3 * 5


def test_search_matches_inline_sq_topk_ivf(spark, index):
    """Same params -> bit-identical (query_id, neighbor_id, cosine_sim,
    rank) as the inline tier: materialization must not change results."""
    from unified_firmographic_data_pipeline_spark.operators.sq import sq_topk_ivf

    path, meta, norm = index
    bounds = [(lo, hi) for lo, hi in meta["bounds"]]
    q = norm.filter((norm.vec_id % 25) == 0)
    a = search_ivf_sq_index(spark, path, q, k=10, n_probe=2, shortlist=50)
    b = sq_topk_ivf(norm, q, bounds, k=10, n_lists=8, n_probe=2, shortlist=50)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb


def test_stream_search_matches_batch(spark, index, tmp_path):
    """Online serving: a file-stream of query vectors searched via
    foreachBatch against the materialized index must produce exactly the
    batch search's results, exactly-once (a restart with the same
    checkpoint reprocesses nothing)."""
    from unified_firmographic_data_pipeline_spark.operators.ann_index import (
        search_ivf_sq_index,
        stream_search_ivf_sq,
    )

    path, meta, norm = index
    qdir = str(tmp_path / "qstream")
    out = str(tmp_path / "results")
    ckpt = str(tmp_path / "ckpt")
    queries = norm.filter("vec_id < 4")
    queries.write.mode("overwrite").parquet(qdir)
    stream = spark.readStream.schema(queries.schema).parquet(qdir)
    q = stream_search_ivf_sq(spark, path, stream, out, ckpt, k=5, n_probe=2, shortlist=20)
    q.awaitTermination(120)
    got = spark.read.parquet(out).drop("batch_id")
    want = search_ivf_sq_index(spark, path, queries, k=5, n_probe=2, shortlist=20)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # exactly-once: re-running with the same checkpoint adds nothing
    stream2 = spark.readStream.schema(queries.schema).parquet(qdir)
    q2 = stream_search_ivf_sq(spark, path, stream2, out, ckpt, k=5, n_probe=2, shortlist=20)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == want.count()


def test_append_then_search_finds_new_vectors(spark, emb, tmp_path):
    """Index lifecycle: build on half the corpus, append the rest with
    the STORED quantizers, then a query near an appended vector must
    retrieve appended neighbors — and the code/vector row counts must
    cover the full corpus."""
    import os

    from unified_firmographic_data_pipeline_spark.operators.ann_index import (
        append_to_ivf_sq_index,
        build_ivf_sq_index,
        search_ivf_sq_index,
    )

    path = str(tmp_path / "idx2")
    norm = l2_normalized(emb)
    first = norm.filter("vec_id % 2 = 0")
    rest = norm.filter("vec_id % 2 = 1")
    build_ivf_sq_index(first, path, n_lists=8)
    append_to_ivf_sq_index(rest, path)
    n_total = norm.count()
    data = spark.read.parquet(os.path.join(path, "data"))
    assert data.count() == n_total
    assert set(data.columns) == {"vec_id", "codes", "embedding", "list"}
    q = norm.filter("vec_id < 4")
    got = search_ivf_sq_index(spark, path, q, k=10, n_probe=4, shortlist=100)
    neigh = {r["neighbor_id"] for r in got.collect()}
    assert any(n % 2 == 1 for n in neigh), "appended vectors must be retrievable"


def test_stale_index_cache_siblings_pruned(tmp_path):
    """Round-5 advisor finding: mtime-keyed cache dirs accumulated forever.
    Building under a new key must remove same-(sf_dir, params) siblings
    with a different stamp — and ONLY those."""
    from unified_firmographic_data_pipeline_spark.plans.driver_queries import (
        _prune_stale_index_siblings,
    )

    cache = tmp_path / ".ann_index_cache"
    cache.mkdir()
    live = cache / "sf0.1_222_n8d64v1"
    stale = cache / "sf0.1_111_n8d64v1"
    other_sf = cache / "sf0.01_111_n8d64v1"
    other_params = cache / "sf0.1_111_n16d64v1"
    for d in (live, stale, other_sf, other_params):
        d.mkdir()
        (d / "_meta.json").write_text("{}")

    _prune_stale_index_siblings(str(live))
    assert live.exists(), "the live key must survive"
    assert not stale.exists(), "stale same-sf sibling must be pruned"
    assert other_sf.exists(), "a different scale factor's cache is untouched"
    assert other_params.exists(), "a different param key is untouched"

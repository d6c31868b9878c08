"""Materialized IVF-SQ index: the PHYSICAL form of the IVF tiers.

The logical tiers (``similarity.cosine_topk_ivf``, ``pq.pq_topk_ivf``,
``sq.sq_topk_ivf``) restrict the scan with a list-id equi-join computed
inline. At 100 TB an index is built ONCE and persisted; this module
materializes it so probing becomes **partition pruning** — the corpus
codes are written parquet-partitioned by coarse list id, and a search
reads ONLY the probed lists' directories. The scan reduction stops
being a plan property and becomes a planning fact — the probe-union
filter lands in the scans' PartitionFilters (the test pins it there;
note ``DataFrame.inputFiles()`` can NOT show this — it lists the
relation before pruning).

Layout under ``path``:
  ``data/list=<id>/*.parquet`` — (vec_id, codes: array<int>, embedding)
      in ONE dataset, one directory per coarse list (Hive-style
      partitioning so Spark prunes on ``list`` filters). One dataset on
      purpose: parquet COLUMN pruning gives the code-only scan and the
      vector-only re-rank read for free, while build/append pay a
      single corpus scan instead of one per projection;
  ``_meta.json`` — centroids + SQ bounds + params (bounded driver-side
      state: n_lists x d + 2 x d floats), written via the Hadoop FS API
      so any filesystem the parquet lands on works.

Search: probe lists are computed on the DRIVER for the (bounded —
contractually a sample, same as every eval/query set in this repo)
query set; their union becomes a static ``list IN (...)`` filter that
Catalyst turns into partition pruning; the per-query assignment stays
an equi-join on the pruned scan, then asymmetric SQ distance ->
shortlist -> exact cosine re-rank, identical math to ``sq.sq_topk_ivf``
(the parity test asserts bit-equal results).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from unified_firmographic_data_pipeline_spark.operators.sq import (
    Bounds,
    _asym_dist_micro,
    _codes_col,
    sq_train,
)


def build_ivf_sq_index(
    corpus: DataFrame,
    path: str,
    n_lists: int = 8,
    bounds: Bounds | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
) -> dict:
    """Build and persist the index; returns the meta dict. One pass to
    train bounds (if not supplied), then ONE corpus scan feeding one
    partitioned write (codes and vectors live in the same dataset —
    column pruning splits them again at read time) — no joins, no
    shuffle beyond the partitioned write's own file routing."""
    from unified_firmographic_data_pipeline_spark.operators.clustering import (
        assign_clusters,
        init_centroids_by_id,
    )

    if bounds is None:
        bounds = sq_train(corpus, vec_col, dim)
    centroids = init_centroids_by_id(corpus, n_lists, vec_col, id_col)
    assigned = assign_clusters(corpus, centroids, vec_col)
    (
        assigned.select(
            F.col(id_col),
            _codes_col(bounds, vec_col).alias("codes"),
            F.col(vec_col),
            F.col("cluster_id").alias("list"),
        )
        .write.mode("overwrite")
        .partitionBy("list")
        .parquet(os.path.join(path, "data"))
    )
    meta = {
        "n_lists": n_lists,
        "dim": dim,
        "vec_col": vec_col,
        "id_col": id_col,
        "bounds": [[lo, hi] for lo, hi in bounds],
        "centroids": [[int(cid), list(vec)] for cid, vec in centroids],
    }
    _fs_write_text(
        corpus.sparkSession, os.path.join(path, "_meta.json"), json.dumps(meta)
    )
    return meta


def _fs_write_text(spark: SparkSession, path_str: str, text: str) -> None:
    """Write a small text file through the Hadoop FS API, so the meta
    sidecar lands wherever the parquet does (file://, hdfs://, s3a://
    ...) — a driver-local ``open()`` would silently pin the whole index
    to the driver's disk."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path_str)
    fs = p.getFileSystem(conf)
    out = fs.create(p, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def _fs_read_text(spark: SparkSession, path_str: str) -> str:
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path_str)
    fs = p.getFileSystem(conf)
    stream = fs.open(p)
    baos = jvm.java.io.ByteArrayOutputStream()
    jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, baos, conf, True)
    return bytes(baos.toByteArray()).decode("utf-8")


def load_index_meta(path: str, spark: SparkSession | None = None) -> dict:
    """Read the meta sidecar. Local paths read directly; any other
    filesystem goes through the Hadoop FS API (needs a session — the
    active one is used when not passed)."""
    local = os.path.join(path, "_meta.json")
    if os.path.exists(local):
        with open(local) as f:
            return json.load(f)
    if spark is None:
        spark = SparkSession.getActiveSession()
        if spark is None:
            raise FileNotFoundError(local)
    return json.loads(_fs_read_text(spark, local))


def _probe_lists_expr(centroids, n_probe: int, vec_col: str):
    """Shared IVF probe selector — see clustering.probe_lists_expr."""
    from unified_firmographic_data_pipeline_spark.operators.clustering import (
        probe_lists_expr,
    )

    return probe_lists_expr(centroids, n_probe, vec_col)


def search_ivf_sq_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 2,
    shortlist: int = 50,
) -> DataFrame:
    """Search the materialized index. The union of the query set's probe
    lists (bounded: queries x n_probe ids, collected driver-side) becomes
    a static partition filter — unprobed list directories are never
    opened. Per-query routing stays the ``__list`` equi-join on the
    pruned scan; distances/re-rank are bit-identical to
    ``sq.sq_topk_ivf`` with the same parameters."""
    meta = load_index_meta(path, spark)
    bounds: Bounds = [(lo, hi) for lo, hi in meta["bounds"]]
    centroids = [(cid, vec) for cid, vec in meta["centroids"]]
    vec_col, id_col = meta["vec_col"], meta["id_col"]
    probes = _probe_lists_expr(centroids, n_probe, vec_col)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.explode(probes).alias("__list"),
    )
    probed = sorted(
        {r["__list"] for r in q.select("__list").distinct().collect()}
    )
    data = spark.read.parquet(os.path.join(path, "data")).filter(
        F.col("list").isin(probed)
    )
    codes = data.select(
        F.col(id_col).alias("neighbor_id"),
        "codes",
        F.col("list").alias("__list"),
    )
    dist = _asym_dist_micro(F.col("__qv"), F.col("codes"), bounds)
    scored = (
        codes.join(F.broadcast(q), "__list")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", dist.alias("sq_dist_micro"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sq_dist_micro").asc_nulls_last(), F.col("neighbor_id").asc()
    )
    cand = scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= shortlist
    )
    from unified_firmographic_data_pipeline_spark.operators.similarity import (
        exact_cosine_rerank,
    )

    # every shortlist candidate lives in a probed list, so the re-rank
    # vector read prunes to the same partitions (and column pruning
    # keeps the codes column out of this scan)
    corpus = data.select(id_col, vec_col)
    return exact_cosine_rerank(cand, corpus, queries, k, vec_col, id_col)


def stream_search_ivf_sq(
    spark: SparkSession,
    index_path: str,
    query_stream: DataFrame,
    out_path: str,
    checkpoint: str,
    k: int = 10,
    n_probe: int = 2,
    shortlist: int = 50,
):
    """Online ANN serving: a STREAM of query vectors searched against the
    materialized index, exactly-once per micro-batch.

    Per-query top-k needs a rank window, which Structured Streaming
    cannot run incrementally — so each micro-batch is searched as a
    batch via ``foreachBatch`` (the sanctioned escape hatch this repo
    already uses for the streaming MERGE sink, ``streaming/ingest.py``)
    and written to ``out_path``. Delivery is exactly-once because the
    write is IDEMPOTENT per micro-batch: results land under a
    ``batch_id=<n>`` partition via dynamic partition overwrite, so a
    batch retried after a crash between its write and the checkpoint
    commit replaces its own partition instead of appending duplicates
    (a plain append sink here would only be at-least-once). Results for
    a given query batch are identical to calling ``search_ivf_sq_index``
    on the same rows (pinned in tests). The index side stays the
    static, partition-pruned read — the stream-static join shape, with
    the static side's scan restricted per batch to the batch's probe
    union."""

    def _search(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        out = search_ivf_sq_index(
            spark, index_path, batch_df, k=k, n_probe=n_probe, shortlist=shortlist
        )
        (
            out.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_path)
        )

    return (
        query_stream.writeStream.foreachBatch(_search)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def append_to_ivf_sq_index(
    corpus_new: DataFrame,
    path: str,
) -> dict:
    """Incremental index maintenance: assign NEW vectors to coarse lists
    and encode them with the STORED centroids/bounds (no retrain — the
    standard IVF append contract: cheap, deterministic, and recall
    degrades only as the data drifts from the trained quantizers; a
    periodic rebuild resets that). One append-mode partitioned write,
    no shuffle beyond file routing. Returns the (unchanged) meta.

    Idempotence is the CALLER's job (feed only new ids — e.g. via the
    repo's high-watermark filter, ``operators/incremental.py``); the
    files themselves append blindly, like any parquet append sink."""
    from unified_firmographic_data_pipeline_spark.operators.clustering import (
        assign_clusters,
    )

    meta = load_index_meta(path, corpus_new.sparkSession)
    bounds: Bounds = [(lo, hi) for lo, hi in meta["bounds"]]
    centroids = [(cid, vec) for cid, vec in meta["centroids"]]
    vec_col, id_col = meta["vec_col"], meta["id_col"]
    assigned = assign_clusters(corpus_new, centroids, vec_col)
    (
        assigned.select(
            F.col(id_col),
            _codes_col(bounds, vec_col).alias("codes"),
            F.col(vec_col),
            F.col("cluster_id").alias("list"),
        )
        .write.mode("append")
        .partitionBy("list")
        .parquet(os.path.join(path, "data"))
    )
    return meta

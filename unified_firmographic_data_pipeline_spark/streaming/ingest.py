"""Streaming ingest — the Spark-native upgrade of COPY INTO's idempotency.

The reference is batch-only (``schedule_interval=None``, ``DAG:142``); its
COPY INTO gives exactly-once-per-file loading. The Structured Streaming file
source with a checkpoint is the same contract, plus watermarked windowed
aggregation for late events (SURVEY.md §2.K). ``windowed_counts_batch`` is
the identical plan on a batch frame — used by the correctness oracle, since
the streaming and batch expressions share one definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType


def stream_file_ingest(
    spark: SparkSession,
    path: str,
    schema: StructType,
    checkpoint: str,
    out_path: str,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Exactly-once-per-file ingest: file source + checkpoint ledger.

    Each discovered file is processed once across restarts (the checkpoint's
    file log is the COPY INTO load-history analogue, SURVEY.md §2.A A4).
    """
    reader = spark.readStream.schema(schema).format(fmt)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.load(path).withColumn("ingested_at", F.current_timestamp())
    return (
        stream.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def _windowed_counts(events: DataFrame, window: str, ts_col: str) -> DataFrame:
    return (
        events.groupBy(F.window(F.col(ts_col), window).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("double")).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_windowed_counts(
    spark: SparkSession,
    path: str,
    schema: StructType,
    checkpoint: str,
    window: str = "1 hour",
    watermark: str = "1 day",
    ts_col: str = "ts",
) -> "DataFrame":
    """Streaming tumbling-window counts with late-data watermark; caller
    attaches the sink. Late rows beyond ``watermark`` are dropped and window
    state is evicted — bounded state at any scale."""
    stream = spark.readStream.schema(schema).parquet(path)
    return _windowed_counts(stream.withWatermark(ts_col, watermark), window, ts_col)


def windowed_counts_batch(
    events: DataFrame, window: str = "1 hour", ts_col: str = "ts"
) -> DataFrame:
    """Batch twin of ``stream_windowed_counts`` (same expressions, no
    watermark — batch sees all data)."""
    return _windowed_counts(events, window, ts_col)


def stream_session_counts(
    spark: SparkSession,
    path: str,
    schema: StructType,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Streaming session windows: per-key sessions that close after ``gap``
    of inactivity. The watermark bounds session state — a session finalizes
    (and its state is evicted) once the watermark passes its close time, so
    state is proportional to concurrently-open sessions, not history.
    Batch twin: the ``session_window_native`` driver query uses the same
    ``F.session_window`` expression on a static frame."""
    stream = spark.readStream.schema(schema).parquet(path)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col), F.session_window(ts_col, gap).alias("sw"))
        .agg(F.count("*").alias("n_events"))
        .select(
            key_col,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lookback: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: right rows within ``lookback`` before each
    left row, same key (e.g. clicks preceding a purchase).

    Both sides carry watermarks and the join condition is time-bounded in
    BOTH directions, so Spark can evict buffered state once the watermark
    passes the interval — state stays proportional to the lookback window,
    the requirement for an unbounded 24x7 stream.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts] - F.expr(f"INTERVAL {lookback}"))
        & (rw[right_ts] < lw[left_ts])
    )
    return lw.join(rw, cond, "inner")


def stream_upsert_sink(
    stream: DataFrame,
    table_path: str,
    keys: list[str],
    checkpoint: str,
):
    """Streaming MERGE sink via foreachBatch: each micro-batch is upserted
    into the parquet table by key (operators.incremental.upsert — anti-join
    + union + atomic swap). With exactly-once file-source semantics upstream
    and idempotent-by-key merge here, replays converge to the same table —
    the Structured Streaming analogue of dbt's incremental+unique_key
    materialization (SURVEY.md §2.J J3).

    Crash-safety: the merged batch is staged through
    ``catalog.atomic_swap_write`` — the previous table is moved aside, never
    deleted, until the replacement is fully written, so a crash mid-write
    leaves a readable table and the checkpoint replays the batch into it.
    The existence check is explicit (no blanket ``except`` around the read):
    a transient or partial-read failure of a *present* table propagates and
    fails the batch instead of silently truncating the table to one batch."""

    from unified_firmographic_data_pipeline_spark.operators.incremental import upsert
    from unified_firmographic_data_pipeline_spark.sources.catalog import (
        atomic_swap_write,
        fs_exists,
    )

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        existing = spark.read.parquet(table_path) if fs_exists(spark, table_path) else None
        merged = upsert(existing, batch_df, keys)
        # swap-write: upsert lazily reads the path being replaced
        atomic_swap_write(merged, table_path)

    return (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_static_enrich(
    events: DataFrame,
    dim: DataFrame,
    key: str = "user_id",
) -> DataFrame:
    """Stream-static dimension enrichment: join a streaming frame against a
    broadcastable static dimension (the classic 'attach user segment to the
    clickstream' shape). The static side is re-read per micro-batch by the
    engine, so slowly-changing dims pick up updates between batches; the
    broadcast hash join adds NO stream-side state (unlike stream-stream
    joins, nothing is buffered or watermarked). Works identically on a
    batch frame — the oracle/testing twin."""
    return events.join(F.broadcast(dim), key, "left")


def stream_kmv_sketch_sink(
    stream: DataFrame,
    table_path: str,
    checkpoint: str,
    value_col: str,
    group_col: str = "source",
    k: int = 64,
):
    """Maintain a landed KMV distinct sketch from a stream: each
    micro-batch is sketched (``operators.sketches.kmv_sketch``) and
    folded into the parquet sketch table with ``kmv_merge`` — union,
    dedupe, re-truncate to k rows per group. Because the merge is
    idempotent (re-merging the same values changes nothing — the
    mergeable-summary property pinned in tests), checkpoint replays
    converge to the same sketch: the exactly-once-by-construction shape
    of ``stream_upsert_sink`` applied to sketch state. Distinct counts
    and cross-group overlap stay queryable 24x7 from k rows per group
    (``kmv_estimate`` / ``kmv_pairwise_overlap``) without ever rescanning
    history — the streaming twin of the batch sketch queries.

    Same crash-safety contract as ``stream_upsert_sink``: the merged
    sketch stages through ``atomic_swap_write``, and a present-but-
    unreadable table fails the batch instead of truncating state."""

    from unified_firmographic_data_pipeline_spark.operators.sketches import (
        kmv_merge,
        kmv_sketch,
    )
    from unified_firmographic_data_pipeline_spark.sources.catalog import (
        atomic_swap_write,
        fs_exists,
    )

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_sketch = kmv_sketch(batch_df, value_col, group_col=group_col, k=k)
        if fs_exists(spark, table_path):
            merged = kmv_merge(spark.read.parquet(table_path), batch_sketch, k=k)
        else:
            merged = batch_sketch
        atomic_swap_write(merged, table_path)

    return (
        stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_entity_attach_sink(
    stream: DataFrame,
    records_path: str,
    assignments_path: str,
    checkpoint: str,
    id_col: str,
    block_col: str,
    fields: list[str],
    weights: dict[str, tuple[int, int]],
    threshold_micro: int,
):
    """Maintain a landed entity-assignment table from a stream of new
    records — the streaming twin of
    ``plans/entities.resolve_entities_incremental``: each micro-batch
    attaches to the landed (records, assignments) state with the STORED
    EM weights (old x old never recomputes), then both tables stage
    through ``atomic_swap_write``.

    Convergence contract (the ``stream_kmv_sketch_sink`` shape): the
    attach step is idempotent for replayed records — a record already in
    the landed table contributes only self-agreeing pairs whose
    canonical (least, greatest) ids deduplicate against the batch's own
    rows, so checkpoint replays converge to the same assignment table;
    and sequential increments compose — attach(A) then attach(B) equals
    attach(A ∪ B) equals the from-scratch resolve of the union (min-id
    labels are associative under the anchor-edge construction; pinned by
    ``test_stream_entity_attach_matches_batch``).

    Crash safety: a present-but-unreadable landed table fails the batch
    loudly instead of silently restarting entity history."""

    from unified_firmographic_data_pipeline_spark.plans.entities import (
        resolve_entities,
        resolve_entities_incremental,
    )
    from unified_firmographic_data_pipeline_spark.sources.catalog import (
        atomic_swap_write,
        fs_exists,
    )

    rec_cols = [id_col, block_col, *fields]

    def _attach(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_recs = batch_df.select(*rec_cols)
        if fs_exists(spark, records_path):
            old_recs = spark.read.parquet(records_path)
            landed = spark.read.parquet(assignments_path)
            # replayed records are already landed: attach only genuinely
            # new ids so a checkpoint replay is a no-op
            fresh = batch_recs.join(old_recs.select(id_col), id_col, "left_anti")
            asg = resolve_entities_incremental(
                old_recs.join(landed, id_col),
                fresh,
                id_col,
                block_col,
                fields,
                weights=weights,
                threshold_micro=threshold_micro,
            )
            recs = old_recs.unionByName(fresh)
        else:
            asg = resolve_entities(
                batch_recs,
                id_col,
                block_col,
                fields,
                threshold_micro=threshold_micro,
                weights=weights,
            )
            recs = batch_recs
        # materialize before the swap: asg lazily reads the current tables
        recs = recs.localCheckpoint(eager=True)
        asg = asg.localCheckpoint(eager=True)
        atomic_swap_write(recs, records_path)
        atomic_swap_write(asg, assignments_path)

    return (
        stream.writeStream.foreachBatch(_attach)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_cdc_apply_sink(
    stream: DataFrame,
    table_path: str,
    checkpoint: str,
    keys: list[str],
    seq_col: str,
    op_col: str = "op",
) -> StreamingQuery:
    """Apply a CDC event stream (I/U/D rows with full payloads — the
    shape ``operators.incremental.cdc_events`` derives and a Debezium
    topic carries) to a landed table, micro-batch by micro-batch.

    Per batch: keep only each key's LATEST event (max ``seq_col``, op
    descending as the deterministic tiebreak), anti-join the landed
    table on touched keys, then re-insert payloads whose final op is not
    D — one keyed window + one anti-join per batch, costs tracking the
    BATCH size, never the table history. Because only the latest event
    per key matters, applying the same events twice is a no-op
    (checkpoint replays converge — stream_upsert_sink's
    exactly-once-by-construction contract), and micro-batched apply
    equals one-shot batch apply whenever ``seq_col`` is monotone across
    batches (pinned in tests against a from-scratch batch apply).

    Same crash-safety as every sink here: the new table stages through
    ``catalog.atomic_swap_write``; a present-but-unreadable table fails
    the batch instead of truncating state."""

    from pyspark.sql.window import Window

    from unified_firmographic_data_pipeline_spark.sources.catalog import (
        atomic_swap_write,
        fs_exists,
    )

    payload_cols = [c for c in stream.columns if c not in (op_col, seq_col)]

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        w = Window.partitionBy(*keys).orderBy(
            F.col(seq_col).desc(), F.col(op_col).desc()
        )
        latest = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        if fs_exists(spark, table_path):
            base = spark.read.parquet(table_path)
            kept = base.join(latest.select(*keys), keys, "left_anti")
        else:
            kept = spark.createDataFrame(
                [], batch_df.select(*payload_cols).schema
            )
        # null-safe: an event with a NULL op must behave as an upsert, not
        # silently vanish after its key was anti-joined away (!= 'D' is
        # NULL for NULL ops, which a plain filter drops)
        upserts = latest.filter(~F.col(op_col).eqNullSafe("D")).select(*payload_cols)
        atomic_swap_write(kept.unionByName(upserts), table_path)

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_exact_dedup_sink(
    stream: DataFrame,
    table_path: str,
    checkpoint: str,
    content_col: str = "text",
    id_col: str = "doc_id",
) -> StreamingQuery:
    """Dedup-on-arrival: maintain a landed table of exact-dedup SURVIVORS
    from a document stream — the 24x7 twin of ``operators.dedup
    .dedup_exact`` (md5 of normalized content, keep the lowest id per
    fingerprint).

    Per micro-batch: fingerprint the batch, union with the landed
    survivors, and keep each fingerprint's minimum-id row. Because the
    merge rule is a pure min-fold, it is ORDER-INSENSITIVE and
    IDEMPOTENT: any arrival order, any batch split, and any checkpoint
    replay converge to exactly ``dedup_exact`` of everything ingested so
    far (a later-arriving lower id evicts the earlier survivor) — pinned
    in tests against the from-scratch batch dedup after every batch.

    CALLER CONTRACT: ``id_col`` must identify a document uniquely — two
    rows sharing an id but carrying DIFFERENT content would make the
    replay-collapse ``dropDuplicates`` pick between them arbitrarily
    (the batch operator has the same precondition: its survivor
    semi-join is id-keyed).

    Scale note: like the other landed-state sinks here, this rewrites
    the survivor table per batch via ``atomic_swap_write``; a production
    deployment partitions the table by a fingerprint prefix and rewrites
    only partitions the batch touches (the `stream_upsert_sink`
    contract). Crash-safety: staged swap, and a present-but-unreadable
    table fails the batch instead of truncating state."""

    from unified_firmographic_data_pipeline_spark.functions.text import doc_fingerprint
    from unified_firmographic_data_pipeline_spark.sources.catalog import (
        atomic_swap_write,
        fs_exists,
    )

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        stamped = batch_df.withColumn(
            "__fp", doc_fingerprint(F.col(content_col))
        )
        if fs_exists(spark, table_path):
            stamped = spark.read.parquet(table_path).unionByName(stamped)
        keep = (
            stamped.select("__fp", id_col)
            .groupBy("__fp")
            .agg(F.min(id_col).alias(id_col))
            .select(id_col)
        )
        # replays re-deliver identical rows: collapse them after the
        # survivor semi-join so the landed table stays one row per id
        merged = (
            stamped.join(keep, id_col, "left_semi").dropDuplicates([id_col])
        )
        atomic_swap_write(merged, table_path)

    return (
        stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def additive_state_fold(
    batch_df: DataFrame,
    batch_id: int,
    table_path: str,
    keys: list[str],
    value_col: str,
) -> bool:
    """One exactly-once fold of a micro-batch into a landed additive
    state table (per-key BIGINT sums). Returns False (no-op) when
    ``batch_id`` is already in the applied-batch ledger.

    Additive aggregation is the one state shape foreachBatch CANNOT make
    exactly-once by construction: min-folds (kmv / exact-dedup sinks) and
    key-overwrites (upsert / CDC sinks) are idempotent, but re-adding a
    replayed batch double-counts. The ledger closes that: the landed
    table carries BOTH the state rows (``kind='state'``) and one row per
    applied batch id (``kind='batch'``) in the SAME parquet directory,
    so ``atomic_swap_write`` commits the sum update and its ledger entry
    atomically — a crash between "state written" and "ledger written"
    cannot exist, which is exactly the torn-write that breaks the naive
    two-file design. (Transactional tables solve this with
    txnAppId/txnVersion metadata — Delta's idempotent-write contract —
    this is the same protocol on plain parquet.)

    Bounded-collect contract: the ledger is one row per micro-batch ever
    applied — driver-side membership check reads batch ids only, bounded
    by stream lifetime, never by data."""

    from unified_firmographic_data_pipeline_spark.sources.catalog import (
        atomic_swap_write,
        fs_exists,
    )

    spark = batch_df.sparkSession
    agg = batch_df.groupBy(*keys).agg(
        F.sum(F.col(value_col)).cast("long").alias("total")
    )
    if fs_exists(spark, table_path):
        landed = spark.read.parquet(table_path)
        applied = {
            r["batch_id"]
            for r in landed.filter(F.col("kind") == "batch")
            .select("batch_id")
            .collect()
        }
        if batch_id in applied:
            return False
        state = landed.filter(F.col("kind") == "state").select(*keys, "total")
        merged = (
            state.unionByName(agg)
            .groupBy(*keys)
            .agg(F.sum("total").cast("long").alias("total"))
        )
        ledger_ids = sorted(applied | {batch_id})
    else:
        merged = agg
        ledger_ids = [batch_id]
    state_rows = merged.select(
        F.lit("state").alias("kind"), *keys, "total", F.lit(None).cast("long").alias("batch_id")
    )
    ledger_rows = spark.createDataFrame(
        [(int(b),) for b in ledger_ids], "batch_id long"
    ).select(
        F.lit("batch").alias("kind"),
        *[F.lit(None).cast(dict(merged.dtypes)[k]).alias(k) for k in keys],
        F.lit(None).cast("long").alias("total"),
        "batch_id",
    )
    atomic_swap_write(state_rows.unionByName(ledger_rows), table_path)
    return True


def stream_additive_state_sink(
    stream: DataFrame,
    table_path: str,
    checkpoint: str,
    keys: list[str],
    value_col: str,
) -> StreamingQuery:
    """Maintain landed per-key additive sums from a stream with
    exactly-once semantics via :func:`additive_state_fold`'s
    applied-batch ledger (see its docstring for the protocol). Query the
    state with ``kind = 'state'``."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        additive_state_fold(batch_df, batch_id, table_path, keys, value_col)

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def lsh_neardup_fold(
    batch_df: DataFrame,
    batch_id: int,
    index_path: str,
    candidates_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> bool:
    """One fold of a document micro-batch into the landed LSH near-dup
    state (round-9 verdict item #4 — the streaming unification of the
    batch-incremental ``operators.neardup.lsh_candidates_from_buckets``
    with the exact-dedup sink shape). Two landed outputs:

    - ``index_path``: the persistable ``(id, band, bucket)`` band table
      (``minhash_band_buckets``), grown by the batch's genuinely-new
      docs (anti-join on id — the high-watermark idea applied to the
      index).
    - ``candidates_path/batch=<id>``: the candidate pairs TOUCHING this
      batch's new docs (new↔landed and new↔new), batch-keyed.

    Idempotence is the two mechanisms composed, and WRITE ORDER is the
    proof obligation: candidates land FIRST (batch-keyed overwrite — a
    replay rewrites identical content, the key-drift-monitor contract),
    the index appends SECOND. A crash between the writes replays into
    "index doesn't know these docs yet" → the same candidate set
    recomputes (deterministically — the pair set is a distinct equi-join
    of the same buckets) and overwrites itself, then the index append
    completes. A replay of a FULLY applied batch anti-joins to zero new
    docs and returns False without touching either table — which also
    means the candidate partition of an already-applied batch is never
    clobbered with an empty frame. Exactly-once without a ledger:
    old×old pairs are never re-derived, and each pair {x, y} is emitted
    exactly once — by the batch that lands the LATER of the two docs.

    CALLER CONTRACT (same as the exact-dedup sink): ``id_col``
    identifies a document immutably — re-sending an id with different
    content is not an update (the doc keeps its original fingerprint;
    content updates belong to the CDC/upsert sinks). The LSH parameters
    are part of the index's identity and must match across all folds.

    Scale shape: per batch, one minhash over the BATCH only (the landed
    corpus is never re-signed), one id anti-join, one (band, bucket)
    equi-join whose cost tracks the increment's bucket matches — the
    1.1x-at-10x curve of `lsh_incremental_candidates` (SCALE.md), now
    24x7. The full-index swap write is the plain-parquet stand-in for a
    partition-targeted append (the stream_upsert_sink note applies)."""
    from unified_firmographic_data_pipeline_spark.operators.neardup import (
        lsh_candidates_from_buckets,
        minhash_band_buckets,
    )
    from unified_firmographic_data_pipeline_spark.sources.catalog import (
        atomic_swap_write,
        fs_exists,
    )

    spark = batch_df.sparkSession
    buckets = minhash_band_buckets(
        batch_df.dropDuplicates([id_col]),
        id_col,
        text_col,
        num_hashes,
        bands,
        shingle_n,
    )
    existing = None
    if fs_exists(spark, index_path):
        existing = spark.read.parquet(index_path)
        new_b = buckets.join(
            existing.select(id_col).distinct(), id_col, "left_anti"
        )
    else:
        new_b = buckets
    # one eager materialization: the minhash pipeline would otherwise
    # re-execute for the emptiness probe, the pair join (twice, via the
    # union) and the index write
    new_b = new_b.localCheckpoint(eager=True)
    if new_b.isEmpty():
        return False
    all_b = existing.unionByName(new_b) if existing is not None else new_b
    cands = lsh_candidates_from_buckets(new_b, all_b, id_col).withColumn(
        "batch_id", F.lit(batch_id).cast("long")
    )
    atomic_swap_write(cands, f"{candidates_path}/batch={batch_id}")
    atomic_swap_write(all_b, index_path)
    return True


def stream_lsh_neardup_sink(
    stream: DataFrame,
    index_path: str,
    candidates_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> StreamingQuery:
    """Near-dedup-on-arrival: wire :func:`lsh_neardup_fold` into a
    ``foreachBatch`` sink — the MinHash-LSH twin of
    :func:`stream_exact_dedup_sink`. After any prefix of batches, the
    union of the landed ``candidates_path/batch=*`` partitions equals
    the from-scratch batch ``minhash_lsh_candidates`` of everything
    ingested so far (pinned in tests, including a checkpoint-replay
    re-fold)."""

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        lsh_neardup_fold(
            batch_df,
            batch_id,
            index_path,
            candidates_path,
            id_col,
            text_col,
            num_hashes,
            bands,
            shingle_n,
        )

    return (
        stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_key_drift_monitor(
    stream: DataFrame,
    reference_path: str,
    log_path: str,
    checkpoint: str,
    json_col: str = "props",
) -> StreamingQuery:
    """Streaming twin of the batch JSON key-drift audit
    (``quality/drift.py:json_key_drift`` / the ``json_key_drift_audit``
    query): every micro-batch's top-level-key occurrence profile is
    diffed against the LANDED reference table, and the per-key diff —
    including the ``__null__`` / ``__malformed__`` / ``__nonobject__``
    dirty-payload sentinels — lands under ``log_path/batch=<id>``. The
    monitor a VARIANT-tolerant ingest needs at serve time: schema drift
    (and parse-rate collapse) in the feed surfaces as rows in the drift
    log WHILE landing, not in a post-hoc batch sweep.

    Idempotent by construction: each batch OVERWRITES its own
    ``batch=<id>`` subdirectory (atomic_swap_write staging), so a
    checkpoint replay rewrites identical content instead of
    double-appending — no ledger needed because the output is keyed by
    batch_id, unlike the additive-state fold.

    Scale shape: the reference profile is one key-explode + bounded
    key-axis groupBy over the landed table per batch; a deployment with
    a large reference lands its (key, n, total) profile ONCE and reuses
    it — the diff itself is key-axis-sized either way.

    CALLER CONTRACT: ``reference_path`` must exist (the landed batch
    table the stream was bootstrapped from); probed with ``fs_exists``
    and raised on absence rather than silently diffing against empty."""
    from unified_firmographic_data_pipeline_spark.quality.drift import json_key_drift
    from unified_firmographic_data_pipeline_spark.sources.catalog import (
        atomic_swap_write,
        fs_exists,
    )

    def _diff(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if not fs_exists(spark, reference_path):
            raise FileNotFoundError(
                f"key-drift reference table missing: {reference_path}"
            )
        reference = spark.read.parquet(reference_path)
        diff = json_key_drift(reference, batch_df, json_col).withColumn(
            "batch_id", F.lit(batch_id).cast("long")
        )
        atomic_swap_write(diff, f"{log_path}/batch={batch_id}")

    return (
        stream.writeStream.foreachBatch(_diff)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )

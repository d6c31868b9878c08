"""Parquet table catalog + materializers (SURVEY.md §2.A A5/A6, §3.2).

The medallion layers (raw/staging/core/analytics) are directories of parquet
tables. Three materialization strategies, mirroring dbt's
(``dbt_project.yml:35-56``):

- ``table``: full overwrite (dims/fact).
- ``incremental``: watermark delta + keyed upsert (staging/core/fact).
- ``snapshot``: SCD2 fold (snapshots).

Writes are atomic via write-temp-then-swap (Spark's parquet overwrite is not
atomic on plain filesystems; with Delta/Iceberg this class would delegate to
MERGE/REPLACE and inherit ACID)."""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


class Catalog:
    """Path-addressed parquet catalog rooted at ``root``; schema/table
    naming mirrors the reference's RAW/STAGING/CORE/ANALYTICS layout
    (reference README.md:520-527)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def path(self, schema: str, table: str) -> str:
        return os.path.join(self.root, schema.lower(), table.lower())

    def exists(self, schema: str, table: str) -> bool:
        p = self.path(schema, table)
        return os.path.exists(p) and bool(
            [f for f in os.listdir(p) if f.endswith(".parquet") or f == "_SUCCESS"]
        )

    def read(self, schema: str, table: str) -> DataFrame:
        return self.spark.read.parquet(self.path(schema, table))

    def read_or_none(self, schema: str, table: str) -> DataFrame | None:
        return self.read(schema, table) if self.exists(schema, table) else None

    def overwrite(self, df: DataFrame, schema: str, table: str, partition_by: list[str] | None = None) -> None:
        """Atomic full-refresh write: write to a temp dir, then swap. The
        self-referencing incremental pattern (read prior output while
        computing the new one) requires this — a direct overwrite would
        truncate its own input before reading it."""
        final = self.path(schema, table)
        tmp = final + ".tmp-" + uuid.uuid4().hex[:8]
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(tmp)
        old = final + ".old-" + uuid.uuid4().hex[:8]
        if os.path.exists(final):
            os.replace(final, old)
        os.replace(tmp, final)
        if os.path.exists(old):
            shutil.rmtree(old, ignore_errors=True)

    def append(self, df: DataFrame, schema: str, table: str) -> None:
        df.write.mode("append").parquet(self.path(schema, table))


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Materialize a bucketed (and optionally sorted) managed table.

    Bucketing is the co-located-join device: two tables bucketed on the
    same key with the same bucket count join WITHOUT a shuffle — at 100 TB
    the difference between moving terabytes per join and moving nothing.
    Sorted buckets additionally drop the sort from sort-merge joins.
    (Spark bucketed tables require saveAsTable; path-only parquet writes
    can't record bucket metadata.)
    """
    w = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table, format="parquet")


def compact_small_files(
    spark: SparkSession,
    path: str,
    target_mb: int = 128,
    sort_within_by: list[str] | None = None,
) -> int:
    """Rewrite a parquet directory into ~``target_mb``-sized files.

    Streaming sinks and incremental appends accumulate small files; at scale
    the resulting scan-task explosion (one task per tiny file) and NameNode/
    listing pressure dominate query time. Sizing uses the on-disk bytes of
    the existing directory (no data pass), and the rewrite is staged through
    a temp dir + atomic swap like Catalog.overwrite. ``sort_within_by``
    sorts within each output file (better column compression + min/max
    pruning). Returns the output file count.
    """
    total = 0
    for root, _, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files if f.endswith(".parquet"))
    n_files = max(1, round(total / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    out = df.repartition(n_files)
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    tmp = path.rstrip("/") + f".__compact_{uuid.uuid4().hex[:8]}"
    out.write.mode("overwrite").parquet(tmp)
    final_files = [
        f for f in os.listdir(tmp) if f.endswith(".parquet")
    ]
    shutil.rmtree(path)
    os.rename(tmp, path)
    return len(final_files)

"""Small-file compaction planning — the OPTIMIZE-style bin packer.

At 100 TB the silent killer is the small-files problem: streaming ingest
and incremental upserts leave partitions with thousands of sub-target
files, and every scan pays per-file open/footer costs. Lakehouse engines
answer with a compaction command (e.g. Delta Lake's OPTIMIZE) whose core
is bin packing: group each partition's files into target-sized rewrite
bins. This module implements the planner as first-fit-decreasing (FFD —
the classic 11/9·OPT + 6/9 guarantee, Johnson 1973), the same family the
public compaction implementations use.

Scale shape: packing is per-PARTITION sequential by nature (bin state
threads through the file list), so the parallel unit is the partition —
``applyInPandas`` over the partition key runs thousands of independent
packs concurrently, each bounded by its partition's file count. This is
the sanctioned Python tier (SURVEY §2.L: builtin > pandas_udf > never
row-UDF): the decision is inherently iterative per group, Arrow-batched,
and never corpus-global. The plan output is bins, not data — executing
the plan is the caller's rewrite job.

Determinism (oracle-replay contract): files pack in (size DESC, id ASC)
order and bins are probed in creation order, so the full per-bin load
vector is a pure function of the inventory — the registered query's
DuckDB twin replays the fold with ``list_reduce`` (the Hilbert/EM
device) and checks every bin's byte load and file count, not just bin
counts.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ffd_pack(sizes: list[tuple[int, int]], cap: int) -> list[tuple[int, int]]:
    """Pure-Python FFD over ``(file_id, size)`` pairs: sort by
    (size DESC, file_id ASC), place each file in the FIRST bin (creation
    order) whose load stays <= cap, else open a new bin. Oversized files
    (> cap) get a singleton bin — compaction never splits a file.
    Returns the bin vector as ``[(bin_bytes, n_files), ...]`` in creation
    order. This is both the reference implementation and the per-group
    worker :func:`plan_compaction_bins` ships to executors."""
    bins: list[list[int]] = []
    for fid, size in sorted(sizes, key=lambda t: (-t[1], t[0])):
        for b in bins:
            if b[0] + size <= cap:
                b[0] += size
                b[1] += 1
                break
        else:
            bins.append([size, 1])
    return [(b[0], b[1]) for b in bins]


def plan_compaction_bins(
    files: DataFrame,
    part_col: str = "source",
    id_col: str = "doc_id",
    size_col: str = "n_chars",
    target_bytes: int = 1024,
    max_files_per_partition: int = 100_000,
) -> DataFrame:
    """Compaction plan: one row per rewrite bin,
    ``(part_col, bin_id, bin_bytes, n_files)``, bins numbered in creation
    order per partition. One shuffle on the partition key; each group
    packs independently in Arrow batches.

    FFD is O(files x bins) PER PARTITION, so the scale contract is
    incremental compaction: each run packs only the small files
    accumulated since the last run (bounded inventory), partitions pack
    in parallel. A partition inventory beyond ``max_files_per_partition``
    raises loudly instead of packing quadratically — run compaction more
    often or shard the partition (the ``cosine_topk_numpy`` max_queries
    precedent: enforced bounds, not silent cliffs)."""
    part_t = files.schema[part_col].dataType.simpleString()
    schema = (
        f"{part_col} {part_t}, bin_id int, bin_bytes long, n_files long"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        part = pdf[part_col].iloc[0]
        if len(pdf) > max_files_per_partition:
            raise ValueError(
                f"partition {part!r} has {len(pdf)} files > "
                f"max_files_per_partition={max_files_per_partition}; FFD is "
                "O(files x bins) per partition — compact more often or "
                "shard the partition"
            )
        bins = ffd_pack(
            list(zip(pdf[id_col].tolist(), pdf[size_col].tolist())),
            cap=target_bytes,
        )
        return pd.DataFrame(
            {
                part_col: [part] * len(bins),
                "bin_id": range(1, len(bins) + 1),
                "bin_bytes": [b[0] for b in bins],
                "n_files": [b[1] for b in bins],
            }
        )

    inv = files.select(part_col, id_col, size_col)
    return inv.groupBy(part_col).applyInPandas(pack, schema)

"""Structured Streaming ingest (SURVEY.md §2.K extension)."""

from unified_firmographic_data_pipeline_spark.streaming.ingest import (
    stream_file_ingest,
    stream_windowed_counts,
    windowed_counts_batch,
)

__all__ = ["stream_file_ingest", "stream_windowed_counts", "windowed_counts_batch"]

"""Structured Streaming ingestion (beyond the batch-only reference)."""

from finetoo_sp_spark.streaming.ingest import (
    run_stream_once,
    stream_extract,
    stream_pages,
)

__all__ = ["stream_pages", "stream_extract", "run_stream_once"]

"""Structured Streaming surface.

The reference has NO streaming operators ("incremental" means batch append of
a new immutable version — ``documentation/incremental_preprocessing.md``;
SURVEY §2.5). This package is the Spark-first superset: continuous NDJSON
ingest into the same versioned store, and watermarked window aggregations
over event streams.
"""

from lapis_silo_spark.streaming.ingest import (
    stream_append,
    stream_ingest_files,
    windowed_counts,
)

__all__ = ["stream_append", "stream_ingest_files", "windowed_counts"]

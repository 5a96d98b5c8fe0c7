"""Large-scale training-data pipeline operators.

Beyond the reference's own surface (per the build brief): deduplication,
similarity search, text analysis, and multimodal column plumbing — all
expressed as JVM-side Spark SQL expressions wherever possible (no Python in
the hot path), with deterministic md5-derived hashing so every operator is
reproducible in ANSI SQL for the DuckDB oracle gate.
"""

from lapis_silo_spark.functions import dedup, multimodal, similarity, text

__all__ = ["dedup", "similarity", "text", "multimodal"]

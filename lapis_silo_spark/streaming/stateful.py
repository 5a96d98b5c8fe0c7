"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no streaming at all (SURVEY §2.5); these are the
Spark-first extensions a continuous training-data pipeline needs. The
flagship one is cross-batch exact dedup: emit each document the FIRST time
its content digest is seen, remembering digests in partitioned group state.

Scale design: state is keyed by a fixed-width digest prefix (256 groups by
default), so state shards evenly across executors no matter how skewed the
document stream is, and each group's state is a plain sorted digest list —
the RocksDB/HDFS state store handles persistence and recovery.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from lapis_silo_spark.functions.text import normalized

_OUTPUT_SCHEMA = "id string, digest string"
_STATE_SCHEMA = "seen array<string>"


def _dedup_group(
    key: Any,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    seen: set = set(state.get[0]) if state.exists else set()
    fresh_ids: list = []
    fresh_digests: list = []
    for pdf in pdfs:
        for row_id, digest in zip(pdf["id"], pdf["digest"]):
            if digest not in seen:
                seen.add(digest)
                fresh_ids.append(row_id)
                fresh_digests.append(digest)
    state.update((sorted(seen),))
    yield pd.DataFrame({"id": fresh_ids, "digest": fresh_digests})


def streaming_exact_dedup(
    stream: DataFrame,
    id_col: str,
    text_col: str,
    prefix_len: int = 2,
) -> DataFrame:
    """First-seen exact dedup across micro-batches.

    Returns ``(id, digest)`` rows for documents whose normalized-text digest
    has not appeared in any earlier batch (or earlier in this batch). Works
    on a streaming DataFrame; pair with ``outputMode("update")``.
    """
    digests = stream.select(
        F.col(id_col).cast("string").alias("id"),
        F.md5(normalized(text_col)).alias("digest"),
    ).withColumn("grp", F.substring("digest", 1, prefix_len))
    return digests.groupBy("grp").applyInPandasWithState(
        _dedup_group,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

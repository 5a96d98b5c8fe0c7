"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no streaming at all (SURVEY §2.5); these are the
Spark-first extensions a continuous training-data pipeline needs:
cross-batch exact dedup (emit each document the FIRST time its content
digest is seen) and gap-based sessionization with event-time timeouts.

Scale design: dedup state is keyed by a fixed-width digest prefix (256
groups by default), so state shards evenly across executors no matter how
skewed the document stream is, and each group's state is a plain sorted
digest list — the RocksDB/HDFS state store handles persistence and
recovery. Session state is one open-session triple per key, closed either
by an in-batch gap or by the watermark passing end+gap (EventTimeTimeout),
so state size is O(active keys), never O(events).
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


_SESS_OUTPUT = (
    "key string, session_start timestamp, session_end timestamp, "
    "n_events bigint"
)
_SESS_STATE = "start timestamp, end timestamp, n bigint"


def streaming_sessionize(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Per-key gap sessionization over a stream: emit one row per CLOSED
    session ``(key, session_start, session_end, n_events)``.

    A session closes when (a) a later in-batch event for the key arrives
    more than ``gap_seconds`` after it, or (b) the event-time watermark
    passes ``session_end + gap`` (EventTimeTimeout) — so quiet keys flush
    without waiting for their next event. Spark's built-in
    ``session_window`` covers windowed aggregates; this operator is the
    per-key custom-state variant (and the streaming twin of
    ``operators/temporal.py::sessionize``). Pair with
    ``outputMode("update")``; late events beyond ``watermark_delay`` are
    dropped by the watermark.
    """

    def _group(
        key: Any,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            start, end, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "key": [key[0]],
                    "session_start": [start],
                    "session_end": [end],
                    "n_events": [n],
                }
            )
            return
        ts_sorted = sorted(
            t for pdf in pdfs for t in pdf["ts"].tolist() if t is not None
        )
        sessions: list[list] = []
        if state.exists:
            start, end, n = state.get
            sessions.append([pd.Timestamp(start), pd.Timestamp(end), n])
        for t in ts_sorted:
            if (
                sessions
                and (t - sessions[-1][1]).total_seconds() <= gap_seconds
            ):
                if t > sessions[-1][1]:
                    sessions[-1][1] = t
                sessions[-1][2] += 1
            else:
                sessions.append([t, t, 1])
        if not sessions:
            return
        *closed, current = sessions
        state.update((current[0], current[1], current[2]))
        state.setTimeoutTimestamp(
            int(current[1].timestamp() * 1000) + gap_seconds * 1000
        )
        if closed:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(closed),
                    "session_start": [s[0] for s in closed],
                    "session_end": [s[1] for s in closed],
                    "n_events": [s[2] for s in closed],
                }
            )

    events = stream.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(ts_col).alias("ts"),
    ).withWatermark("ts", watermark_delay)
    return events.groupBy("key").applyInPandasWithState(
        _group,
        outputStructType=_SESS_OUTPUT,
        stateStructType=_SESS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )

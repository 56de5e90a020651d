"""Custom stateful streaming operator: per-user sessionization via
``applyInPandasWithState``.

The graft's streaming surface for operators Spark's built-ins cannot
express (SURVEY.md §2.8): per-key state that survives across micro-
batches with a processing-time timeout. Sessionization is the canonical
case — a session closes when no event arrives within the gap, which a
windowed aggregate cannot express (sessions have data-dependent length).

State per user: the open session (start, end, count). Per micro-batch,
events fold into the state in event-time order; a gap > ``gap_min``
closes the current session (emitted) and opens a new one. On state
timeout (no events for the key this batch and the timeout elapsed) the
open session is emitted and the state cleared — bounding state size to
O(active users), independent of stream length.

``emit_open=True`` additionally emits the still-open session of every key
seen in the batch — the drain/backfill mode that makes one availableNow
pass over a static fixture reproduce the batch sessionize exactly (pinned
in tests/test_streaming.py)."""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("sess_idx", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("sess_idx", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
    ]
)

_US = 1_000_000


def _sessionize_fn(gap_min: int, emit_open: bool, use_timeout: bool):
    gap_us = gap_min * 60 * _US

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            sess_idx, n, start_us, end_us = state.get
            state.remove()
            yield pd.DataFrame(
                [(user_id, sess_idx, n,
                  pd.Timestamp(start_us, unit="us"), pd.Timestamp(end_us, unit="us"))],
                columns=[f.name for f in SESSION_SCHEMA.fields],
            )
            return
        ts_us: list[int] = []
        for pdf in pdfs:
            ts_us.extend(int(v.value // 1000) for v in pd.to_datetime(pdf["ts"]))
        ts_us.sort()
        if state.exists:
            sess_idx, n, start_us, end_us = state.get
        else:
            sess_idx, n, start_us, end_us = 0, 0, None, None
        closed: list[tuple] = []
        for t in ts_us:
            if n == 0:
                sess_idx, n, start_us, end_us = sess_idx + 1, 1, t, t
            elif t - end_us > gap_us:
                closed.append((user_id, sess_idx, n,
                               pd.Timestamp(start_us, unit="us"),
                               pd.Timestamp(end_us, unit="us")))
                sess_idx, n, start_us, end_us = sess_idx + 1, 1, t, t
            else:
                n += 1
                end_us = t
        state.update((sess_idx, n, start_us, end_us))
        if use_timeout:
            state.setTimeoutDuration(gap_min * 60 * 1000)
        rows = closed
        if emit_open and n > 0:
            rows = closed + [(user_id, sess_idx, n,
                              pd.Timestamp(start_us, unit="us"),
                              pd.Timestamp(end_us, unit="us"))]
        yield pd.DataFrame(
            rows, columns=[f.name for f in SESSION_SCHEMA.fields]
        )

    return fn


def sessionize_stream(
    events_stream: DataFrame,
    gap_min: int = 30,
    emit_open: bool = False,
) -> DataFrame:
    """Apply the stateful sessionizer to a streaming events frame
    (columns user_id, ts). Returns the session output stream; write it
    with ``outputMode('append')``."""
    ev = events_stream.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("ts").cast("timestamp").alias("ts"),
    )
    # drain mode (emit_open) must NOT arm processing-time timeouts: an
    # availableNow trigger would otherwise keep scheduling empty batches
    # ("no new data but cleaning up state") until every key's timeout
    # elapses in wall-clock time
    use_timeout = not emit_open
    return ev.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn(gap_min, emit_open, use_timeout),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if use_timeout
            else GroupStateTimeout.NoTimeout
        ),
    )

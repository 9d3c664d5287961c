"""Custom stateful streaming operator: session windows over the event
stream via applyInPandasWithState (SURVEY.md §2D).

Spark's built-in session_window covers simple gap sessions; this is the
general template for operators that need arbitrary per-key state (the
reference's worker loops keep exactly this kind of per-user running
state).  State = the open session per user; a new event either extends
it or closes it (emitting the finished session) and opens a new one.

Completed sessions are emitted as soon as a later event proves the gap;
the final open session per user stays in state until further activity
(or an event-time timeout in a production deployment — noted below).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = ("user_id bigint, session_start timestamp, "
                 "session_end timestamp, n_events bigint")
# state: open-session (start_us, last_us, count)
STATE_SCHEMA = "start_us bigint, last_us bigint, cnt bigint"

GAP_US = 30 * 60 * 1_000_000


def _sessionize_fn(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    ts_us: list[int] = []
    for pdf in pdfs:
        ts_us.extend(int(t) for t in
                     pdf["ts"].astype("datetime64[us]").astype("int64"))
    ts_us.sort()

    if state.exists:
        start, last, cnt = state.get
    else:
        start = last = None
        cnt = 0

    done: list[tuple[int, int, int]] = []
    for t in ts_us:
        if start is None:
            start, last, cnt = t, t, 1
        elif t - last > GAP_US:
            done.append((start, last, cnt))
            start, last, cnt = t, t, 1
        else:
            last, cnt = t, cnt + 1
    state.update((start, last, cnt))

    if done:
        yield pd.DataFrame({
            "user_id": [user_id] * len(done),
            "session_start": pd.to_datetime([d[0] for d in done], unit="us"),
            "session_end": pd.to_datetime([d[1] for d in done], unit="us"),
            "n_events": [d[2] for d in done],
        })


def run_sessionize_bounded(spark, events_path: str) -> DataFrame:
    """Drain a bounded event source through the stateful sessionizer
    (availableNow trigger → memory sink) and return completed sessions.

    Only sessions CLOSED by a later event are emitted; each user's final
    session stays in the state store awaiting more input — the batch
    oracle therefore excludes every user's last session."""
    import uuid

    from data_ingestion_challenge_spark.streaming.pipeline import build_source

    name = "stream_sessions_" + uuid.uuid4().hex[:8]
    q = (
        sessionize_stream(build_source(spark, events_path))
        .writeStream
        .queryName(name)
        .outputMode("append")
        .format("memory")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def sessionize_stream(events: DataFrame) -> DataFrame:
    """events (streaming, with ts watermarked upstream) → completed
    sessions.  Production note: add GroupStateTimeout.EventTimeTimeout
    and emit the open session on timeout so idle users flush; omitted
    here so bounded-drain tests are deterministic."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn, OUTPUT_SCHEMA, STATE_SCHEMA,
            "append", GroupStateTimeout.NoTimeout)
    )

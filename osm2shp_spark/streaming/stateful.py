"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` (the engine's answer to "operators Spark
lacks" in streaming form — SURVEY §2.4).

Per user: events accumulate into an open session; a 30-minute
event-time gap closes it in-batch, and the open tail closes via
EVENT-TIME timeout once the watermark passes session_end + gap.
(ProcessingTimeTimeout is deliberately NOT used: pending wall-clock
timeouts keep an otherwise-drained query triggering empty micro-batches
forever — measured 281 epochs before we killed it — whereas event-time
timeouts quiesce with the watermark.)

State per key is a single open-session tuple — O(1) memory per user,
the canonical bounded-state design for 10^12-event streams.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_S = 1800
WATERMARK_DELAY = "10 seconds"

OUTPUT_SCHEMA = (
    "user_id BIGINT, session_start BIGINT, session_end BIGINT, "
    "n_events BIGINT, total_value DOUBLE"
)
STATE_SCHEMA = (
    "session_start BIGINT, session_end BIGINT, n_events BIGINT, "
    "total_value DOUBLE"
)


def _sessionize(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    closed = []

    if state.hasTimedOut:
        if state.exists:
            s0, s1, n, v = state.get
            closed.append((user_id, s0, s1, n, v))
            state.remove()
    else:
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            # spurious empty invocation: leave state and its pending
            # timeout untouched (pd.concat([]) would raise)
            return
        rows = pd.concat(chunks).sort_values(["ets", "event_id"])
        cur = list(state.get) if state.exists else None
        for ets, val in zip(rows["ets"], rows["value"]):
            ets = int(ets)
            if cur is None:
                cur = [ets, ets, 0, 0.0]
            elif ets - cur[1] > SESSION_GAP_S:
                closed.append((user_id, cur[0], cur[1], cur[2], cur[3]))
                cur = [ets, ets, 0, 0.0]
            # min: an in-watermark event from a LATER batch can still
            # be older than the stored session's start; the batch twin
            # sorts globally, so parity requires absorbing it into
            # session_start, not just session_end
            cur[0] = min(cur[0], ets)
            cur[1] = max(cur[1], ets)
            cur[2] += 1
            cur[3] += float(val)
        expiry_ms = (cur[1] + SESSION_GAP_S) * 1000
        if expiry_ms <= state.getCurrentWatermarkMs():
            # already expired per event time (reachable only when the
            # watermark delay exceeds the session gap): emit now —
            # registering a timeout instead would clamp to watermark+1,
            # and if no further data ever advances the watermark the
            # session would stay open forever
            closed.append((user_id, cur[0], cur[1], cur[2], cur[3]))
            state.remove()
        else:
            state.update(tuple(cur))
            # close the open tail once the watermark passes its gap
            # window (setTimeoutTimestamp throws on timestamps <= the
            # current watermark, hence the expiry guard above)
            state.setTimeoutTimestamp(expiry_ms)

    if closed:
        yield pd.DataFrame(
            closed,
            columns=["user_id", "session_start", "session_end", "n_events", "total_value"],
        )


def sessionize_stream(events: DataFrame) -> DataFrame:
    """events(ts TIMESTAMP, user_id, event_id, value) stream → closed
    sessions. Caller must NOT pre-watermark; done here."""
    prepared = events.withWatermark("ts", WATERMARK_DELAY).select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").alias("ets"),
        "value",
        "ts",
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _sessionize,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def run_sessionize_over_parquet(
    spark: SparkSession, parquet_path: str, name: str = "sessions_out"
) -> DataFrame:
    """Drive the stateful sessionizer over a static events parquet;
    returns closed sessions (in-batch gap closes + watermark-fired
    timeouts; only sessions within the gap of the stream's max event
    time stay open in state)."""
    from osm2shp_spark.streaming.windows import read_events_stream, run_to_memory_sink

    ev = read_events_stream(spark, parquet_path).select(
        "ts", "user_id", "event_id", "value"
    )
    # available_now=False: the event-time timeouts need the extra
    # empty micro-batch after the data drains, which availableNow's
    # bounded plan would skip
    return run_to_memory_sink(sessionize_stream(ev), name, "append", available_now=False)

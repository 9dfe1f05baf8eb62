"""Custom stateful streaming: gap-based session windows via
``applyInPandasWithState`` (SURVEY.md §2.11 — the extension point for
operators Structured Streaming lacks natively).

State per user: the OPEN session (start, last_ts, n, sum). Each
micro-batch folds its events into the state in event-time order;
a gap larger than ``gap_minutes`` closes the session (emitted) and opens
a new one. Event-time timeout closes idle sessions once the watermark
passes. Update-mode emissions carry the latest state of every touched
session, so a downstream idempotent upsert (sinks.upsert_by_key on
(user_id, session_start)) converges to closed-session truth.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("closed", T.BooleanType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_ms", T.LongType()),
        T.StructField("last_ms", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("s", T.DoubleType()),
    ]
)


def sessionize_stream(
    events: DataFrame,
    gap_minutes: float = 30.0,
    watermark: str = "2 hours",
) -> DataFrame:
    gap_ms = int(gap_minutes * 60_000)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        rows: list[tuple[Any, ...]] = []

        if state.hasTimedOut:
            if state.exists:
                start_ms, last_ms, n, s = state.get
                rows.append((user_id, start_ms, last_ms, n, s, True))
                state.remove()
        else:
            batch = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
            cur = list(state.get) if state.exists else None
            for ts, value in zip(batch["ts"], batch["value"]):
                ms = int(ts.value // 1_000_000)
                if cur is None:
                    cur = [ms, ms, 0, 0.0]
                elif ms - cur[1] > gap_ms:
                    rows.append((user_id, cur[0], cur[1], cur[2], cur[3], True))
                    cur = [ms, ms, 0, 0.0]
                cur[1] = ms
                cur[2] += 1
                cur[3] += float(value)
            if cur is not None:
                state.update(tuple(cur))
                state.setTimeoutTimestamp(cur[1] + gap_ms)
                rows.append((user_id, cur[0], cur[1], cur[2], cur[3], False))

        out = pd.DataFrame(
            rows,
            columns=["user_id", "start_ms", "end_ms", "n_events", "sum_value", "closed"],
        )
        out["session_start"] = pd.to_datetime(out["start_ms"], unit="ms")
        out["session_end"] = pd.to_datetime(out["end_ms"], unit="ms")
        yield out[["user_id", "session_start", "session_end", "n_events", "sum_value", "closed"]]

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )

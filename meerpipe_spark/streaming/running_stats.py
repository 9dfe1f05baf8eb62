"""Arbitrary-state streaming with the Spark 4 ``transformWithStateInPandas``
API — the successor to ``applyInPandasWithState`` (typed per-key state
handles, timers, TTL) and the third stateful lane next to it and the
built-in watermarked aggregates.

Operator: RUNNING per-key moment statistics (count, mean, variance via
the parallel/Chan update of Welford's M2) across micro-batches — the
streaming form of the cumulative S/N bookkeeping (A8): every batch
updates the key's sufficient statistics in a ValueState and emits the
refreshed row, so a monitoring sink always sees the latest per-key
(n, mean, variance) without re-reading history. State is THREE doubles
per key — bounded by key cardinality, never by stream length.

ENVIRONMENT GATE: Spark's transformWithState wire protocol imports
``google.protobuf`` (pyspark/sql/streaming/proto); in containers
without protobuf the query fails at initialization with
STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE — the equivalence test
skips there. This module itself has no extra dependency.

Equivalence contract (pinned by tests/test_streaming.py): after the
stream drains, each key's emitted final row equals the batch
aggregation of the same rows exactly — the merge-based M2 update is
order-insensitive at the suffient-statistic level (floating-point
association differs from a single-pass batch stddev by ~1e-15;
asserted at that tolerance).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

STATE_SCHEMA = "n double, mean double, m2 double"
OUTPUT_SCHEMA = "key string, n bigint, mean double, var_samp double"


class RunningStatsProcessor(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("moments", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        n0, mean0, m20 = (
            self._state.get() if self._state.exists() else (0.0, 0.0, 0.0)
        )
        for pdf in rows:
            v = pdf["value"].astype("float64")
            nb = float(len(v))
            if nb == 0:
                continue
            mb = float(v.mean())
            m2b = float(((v - mb) ** 2).sum())
            # Chan et al. parallel update: merge (n0, mean0, m20) + batch
            delta = mb - mean0
            n = n0 + nb
            mean0 = mean0 + delta * (nb / n)
            m20 = m20 + m2b + delta * delta * (n0 * nb / n)
            n0 = n
        self._state.update((n0, mean0, m20))
        var = m20 / (n0 - 1.0) if n0 > 1 else float("nan")
        yield pd.DataFrame(
            {"key": [key[0]], "n": [int(n0)], "mean": [mean0], "var_samp": [var]}
        )

    def close(self) -> None:
        pass


def running_stats_stream(events: DataFrame, key_col: str = "event_type") -> DataFrame:
    """events(key, value) stream → per-key running (n, mean, var_samp),
    one refreshed row per key per micro-batch (update mode)."""
    return (
        events.selectExpr(f"{key_col} AS key", "CAST(value AS DOUBLE) AS value")
        .groupBy("key")
        .transformWithStateInPandas(
            RunningStatsProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )

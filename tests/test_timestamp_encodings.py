"""Regression test for the round-3 TIMESTAMP_NTZ breakage.

The driver has shipped ``events.parquet`` with (at least) three timestamp
encodings across rounds:

- TIMESTAMP(NANOS)  (int64, isAdjustedToUTC irrelevant — Spark has no nanos)
- tz-naive timestamp[us]  (parquet ``isAdjustedToUTC=false`` → TIMESTAMP_NTZ)
- tz-aware timestamp[us]  (``isAdjustedToUTC=true`` → TIMESTAMP/LTZ)

``io.load_tables`` must normalize all three to plain ``timestamp`` so that
every downstream ``unix_millis``/``unix_micros`` call site works, and the
values must be identical (UTC session tz) across encodings.
"""

from __future__ import annotations

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from meerpipe_spark import io as mio

TS = [
    datetime.datetime(2024, 1, 1, 0, 0, 0, 123456),
    datetime.datetime(2024, 6, 15, 12, 34, 56, 789000),
    datetime.datetime(2025, 12, 31, 23, 59, 59, 999999),
]
EXPECT_MICROS = [int(t.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000) for t in TS]


def _write(tmpdir: str, name: str, arrow_type: pa.DataType) -> str:
    path = os.path.join(tmpdir, name, "events.parquet")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(TS).cast(arrow_type),
            "user_id": pa.array([10, 20, 30], pa.int64()),
        }
    )
    pq.write_table(tbl, path)
    return os.path.dirname(path)


@pytest.mark.parametrize(
    "name,arrow_type",
    [
        ("nanos", pa.timestamp("ns")),
        ("ntz_us", pa.timestamp("us")),
        ("ltz_us", pa.timestamp("us", tz="UTC")),
    ],
)
def test_all_encodings_load_as_ltz(spark, tmp_path, name, arrow_type):
    d = _write(str(tmp_path), name, arrow_type)
    df = mio._fix_timestamps(mio._read(spark, os.path.join(d, "events.parquet")))
    ts_field = df.schema["ts"]
    assert isinstance(ts_field.dataType, T.TimestampType), (
        f"{name}: ts loaded as {ts_field.dataType}, want TimestampType"
    )
    # unix_micros must not throw (the round-3 regression) and values must
    # be bit-identical across encodings.
    rows = df.select("event_id", F.unix_micros("ts").alias("us")).orderBy("event_id").collect()
    assert [r.us for r in rows] == EXPECT_MICROS, name


def test_driver_testdata_events_ts_is_ltz(spark, sf_dir):
    """Whatever encoding the driver shipped this round, load_tables must
    hand back plain `timestamp` and unix_millis must evaluate."""
    dfs = mio.load_tables(spark, sf_dir)
    ev = dfs["events"]
    assert isinstance(ev.schema["ts"].dataType, T.TimestampType)
    n = ev.select(F.unix_millis("ts")).limit(5).count()
    assert n > 0

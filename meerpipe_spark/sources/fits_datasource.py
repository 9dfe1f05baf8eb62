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
        return FitsArchiveReader(self.options)

"""NumPy ``.npy`` source (SURVEY.md S10).

Reference: ``configuration_files/928ch_frequency_reference.npy`` — the
928-channel frequency reference list wired into pipeline configs as
``ref_freq_list`` (configuration_files/project_specific/
dm_offset_pta.config:37). The reference loads it with ``np.load`` into a
float64[928] vector used as a broadcast dimension against the channel
axis.

Spark-first:
- small config arrays (the reference's case): load driver-side, emit a
  (idx, value) DataFrame that joins broadcast — identical role to the
  other config dims (chop bounds, flux constants);
- large arrays: the .npy format is a fixed-size header + C-contiguous
  raw buffer, so row ranges map to byte ranges — ``read_npy_distributed``
  parses the header driver-side and streams row-chunks in executors via
  ``mapInPandas`` (Arrow-batched, no driver materialization). The path
  must be visible to executors (shared/object storage on a cluster —
  same contract as every other file source).

No pickle is ever allowed (``allow_pickle=False``): config files are
data, not code.
"""

from __future__ import annotations

import ast
import struct

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

_MAGIC = b"\x93NUMPY"

_NP_TO_SPARK = {
    "f8": T.DoubleType(),
    "f4": T.FloatType(),
    "i8": T.LongType(),
    "i4": T.IntegerType(),
    "i2": T.ShortType(),
    "i1": T.ByteType(),
    "b1": T.BooleanType(),
}


def read_npy_header(path: str) -> tuple[tuple[int, ...], np.dtype, bool, int]:
    """Parse a .npy v1/v2/v3 header without reading the payload.

    Returns (shape, dtype, fortran_order, data_offset). The format is
    public and stable: magic, version, header-length, then a Python
    literal dict ``{'descr','fortran_order','shape'}``.
    """
    with open(path, "rb") as f:
        magic = f.read(6)
        if magic != _MAGIC:
            raise ValueError(f"not a .npy file: {path!r}")
        major, _minor = f.read(2)
        if major == 1:
            (hlen,) = struct.unpack("<H", f.read(2))
        else:
            (hlen,) = struct.unpack("<I", f.read(4))
        header = ast.literal_eval(f.read(hlen).decode("latin1"))
        dtype = np.dtype(header["descr"])
        if dtype.hasobject:
            raise ValueError("object-dtype .npy not supported (pickle disabled)")
        return tuple(header["shape"]), dtype, bool(header["fortran_order"]), f.tell()


def read_npy(
    spark: SparkSession,
    path: str,
    value_col: str = "value",
    idx_col: str = "idx",
) -> DataFrame:
    """Load a 1-D or 2-D .npy array into a DataFrame (driver-side).

    1-D -> (idx, value); 2-D -> (idx, values array<elem>). Intended for
    small config/reference arrays used as broadcast dimensions.
    """
    arr = np.load(path, allow_pickle=False)
    if arr.ndim == 1:
        rows = [(i, arr[i].item()) for i in range(arr.shape[0])]
        elem = _NP_TO_SPARK.get(arr.dtype.str[1:], T.DoubleType())
        schema = T.StructType(
            [T.StructField(idx_col, T.LongType(), False), T.StructField(value_col, elem, False)]
        )
        return spark.createDataFrame(rows, schema)
    if arr.ndim == 2:
        elem = _NP_TO_SPARK.get(arr.dtype.str[1:], T.DoubleType())
        rows = [(i, [v.item() for v in arr[i]]) for i in range(arr.shape[0])]
        schema = T.StructType(
            [
                T.StructField(idx_col, T.LongType(), False),
                T.StructField(value_col + "s", T.ArrayType(elem, False), False),
            ]
        )
        return spark.createDataFrame(rows, schema)
    raise ValueError(f"unsupported ndim {arr.ndim} for {path!r}")


def read_npy_distributed(
    spark: SparkSession,
    path: str,
    rows_per_batch: int = 65536,
    value_col: str = "value",
    idx_col: str = "idx",
) -> DataFrame:
    """Scale path: stream a large 1-D/2-D C-order .npy through executors.

    The header gives (shape, dtype, offset); ``spark.range`` over row
    indices is repartitioned into contiguous chunks and each task reads
    ONLY its byte range via ``np.memmap`` — no driver materialization,
    no full-file broadcast. Parallelism = shape[0]/rows_per_batch tasks.
    """
    shape, dtype, fortran, offset = read_npy_header(path)
    if fortran:
        raise ValueError("fortran-order .npy not supported by the distributed reader")
    if len(shape) not in (1, 2):
        raise ValueError(f"unsupported ndim {len(shape)}")
    nrows = shape[0]
    rowlen = 1 if len(shape) == 1 else shape[1]
    elem = _NP_TO_SPARK.get(dtype.str[1:], T.DoubleType())
    if len(shape) == 1:
        schema = T.StructType(
            [T.StructField(idx_col, T.LongType(), False), T.StructField(value_col, elem, False)]
        )
    else:
        schema = T.StructType(
            [
                T.StructField(idx_col, T.LongType(), False),
                T.StructField(value_col + "s", T.ArrayType(elem, False), False),
            ]
        )
    nparts = max(1, (nrows + rows_per_batch - 1) // rows_per_batch)
    ranges = spark.range(0, nrows, 1, nparts).toDF(idx_col)
    dtype_str, ndim = dtype.str, len(shape)

    def read_chunks(batches):
        import pandas as pd

        mm = np.memmap(path, dtype=np.dtype(dtype_str), mode="r", offset=offset,
                       shape=(nrows, rowlen) if ndim == 2 else (nrows,))
        for pdf in batches:
            idx = pdf[idx_col].to_numpy()
            if ndim == 1:
                yield pd.DataFrame({idx_col: idx, value_col: np.asarray(mm[idx])})
            else:
                yield pd.DataFrame(
                    {idx_col: idx, value_col + "s": [np.asarray(mm[i]).tolist() for i in idx]}
                )

    return ranges.mapInPandas(read_chunks, schema)


def channel_frequency_reference(
    spark: SparkSession, path: str
) -> DataFrame:
    """The reference's ``ref_freq_list`` config dim
    (dm_offset_pta.config:37): (chan_idx, freq_mhz), broadcastable
    against the cube's channel axis for DM-offset work."""
    return read_npy(spark, path, value_col="freq_mhz", idx_col="chan_idx")

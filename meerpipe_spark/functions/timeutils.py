"""Time utilities: MJD ↔ timestamp.

Reference composes MJD from STT_IMJD + STT_SMJD/86400 + STT_OFFS
(dlyfix.py:130-131,273); high-precision paths use DecimalType(38,19)
(SURVEY.md §7.3.1). Millisecond-precision conversions here use exact
integer ms arithmetic so Spark and SQL oracles agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

MJD_UNIX_EPOCH = 40587  # MJD of 1970-01-01
MS_PER_DAY = 86400000


def mjd_from_ts(ts: Column) -> Column:
    """Timestamp → fractional MJD (double; ms precision).

    Accepts LTZ or NTZ input: ``unix_millis`` rejects TIMESTAMP_NTZ, so
    cast to ``timestamp`` first (session tz is UTC — values unchanged)."""
    return F.unix_millis(ts.cast("timestamp")) / float(MS_PER_DAY) + MJD_UNIX_EPOCH


def ts_from_mjd(mjd: Column) -> Column:
    """Fractional MJD → timestamp (ms precision)."""
    return F.timestamp_millis(((mjd - MJD_UNIX_EPOCH) * MS_PER_DAY).cast("long"))


def mjd_compose(imjd: Column, smjd: Column, offs: Column) -> Column:
    """STT_IMJD/STT_SMJD/STT_OFFS → decimal MJD (dlyfix.py:130-131)."""
    return (
        imjd.cast("decimal(38,19)")
        + (smjd.cast("decimal(38,19)") + offs.cast("decimal(38,19)")) / F.lit(86400).cast("decimal(38,19)")
    )

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


# -- scaled-integer high-precision MJD (SURVEY §7.3.1 decimal path) ----------
#
# Spark's decimal DIVISION collapses the result scale to 6 (86 ms/day
# precision — measured), so a naive DECIMAL(38,19) compose loses ns.
# The exact form keeps the TOA as DECIMAL(38,0) in units of 1e-19 day
# ("scaled MJD"): all arithmetic is integer (+, *, %), and every
# division is the exact-quotient identity (x - x % d) / d — an integer
# result, which any engine's decimal division represents exactly
# regardless of its scale rules (DuckDB's twin uses HUGEINT, same
# values). 1e-19 day = 8.6 fs, so ns round-trips with 10^4 headroom;
# 38 digits hold imjd·1e19 up to MJD 10^19.

_P19 = "10000000000000000000"  # 1e19: scaled-MJD units per day
_NS_DAY = "86400000000000"     # ns per day


def _dec(c: Column) -> Column:
    return c.cast("decimal(38,0)")


def _exact_div(num: Column, den: Column) -> Column:
    """Exact integer quotient of decimals: (num - num % den) / den.
    The true quotient is an integer, so the engine's division scale
    cannot lose anything — cross-engine-safe where `div` (bigint) would
    overflow and plain `/` would round."""
    return ((num - num % den) / den).cast("decimal(38,0)")


def mjd_scaled_compose(imjd: Column, day_ns: Column) -> Column:
    """(integer MJD, ns of day) → scaled MJD (DECIMAL(38,0), 1e-19 day
    units). Truncation error of the ns→1e-19-day conversion is < 8.6 fs."""
    p19 = F.expr(f"CAST({_P19} AS DECIMAL(38,0))")
    nsd = F.expr(f"CAST({_NS_DAY} AS DECIMAL(38,0))")
    return _dec(imjd) * p19 + _exact_div(_dec(day_ns) * p19, nsd)


def mjd_scaled_add_ns(bat_scaled: Column, delay_ns: Column) -> Column:
    """Add a ns-denominated residual/delay to a scaled MJD."""
    p19 = F.expr(f"CAST({_P19} AS DECIMAL(38,0))")
    nsd = F.expr(f"CAST({_NS_DAY} AS DECIMAL(38,0))")
    return bat_scaled + _exact_div(_dec(delay_ns) * p19, nsd)


def mjd_scaled_decompose(bat_scaled: Column) -> tuple[Column, Column, Column]:
    """Scaled MJD → (stt_imjd, stt_smjd, stt_offs_ns), rounding the
    fractional day to the nearest ns (half-up; the 8.6 fs grid makes
    the rounding unambiguous for any ns-derived value)."""
    p19 = F.expr(f"CAST({_P19} AS DECIMAL(38,0))")
    nsd = F.expr(f"CAST({_NS_DAY} AS DECIMAL(38,0))")
    half = F.expr("CAST(5000000000000000000 AS DECIMAL(38,0))")
    imjd = _exact_div(bat_scaled, p19).cast("bigint")
    frac = (bat_scaled % p19).cast("decimal(38,0)")
    total_ns = _exact_div(frac * nsd + half, p19).cast("bigint")
    smjd = F.floor(total_ns / F.lit(1_000_000_000)).cast("bigint")
    offs_ns = (total_ns % F.lit(1_000_000_000)).cast("bigint")
    return imjd, smjd, offs_ns


def mjd_scaled_str(bat_scaled: Column) -> Column:
    """Canonical decimal string 'imjd.<19 fraction digits>' — an exact,
    engine-independent rendering of the scaled MJD."""
    p19 = F.expr(f"CAST({_P19} AS DECIMAL(38,0))")
    imjd = _exact_div(bat_scaled, p19).cast("bigint")
    frac = (bat_scaled % p19).cast("decimal(38,0)").cast("string")
    return F.concat(imjd.cast("string"), F.lit("."), F.lpad(frac, 19, "0"))

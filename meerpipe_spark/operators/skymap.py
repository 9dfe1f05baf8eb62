"""Sky-temperature lookups for flux calibration (J2/J3).

Reference: meerpipe/scripts/fluxcal_meerkat.py:144-250 —
- LBAND: CHIPASS continuum raster indexed by an affine WCS pixel
  transform of (RA, Dec); out-of-bounds or NaN-blanked pixels fall back
  to 3400 mK; conversion to Jy is ``1.7202 * (tsky_mk - 3372) * 19/1000``.
- UHF: per-pulsar (psr → Tsky K) table with a 5.5 K default;
  ``tsky_jy = tsky_k * 19``.

Spark-first: the raster is a (ipix1, ipix2, tsky_mk) Parquet table and
the pixel transform is a pure column expression, so the lookup is a
computed-key BROADCAST equi-join (the raster is a few MB). The UHF table
is a broadcast LEFT join + coalesce. Nothing here shuffles the big side.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F

GAIN_K_PER_JY = 19.0
LBAND_TSKY_DEFAULT_MK = 3400.0
UHF_TSKY_DEFAULT_K = 5.5
SARAO_OFFSET_MK = 3372.0
NEW_SCALING = 1.7202


@dataclass(frozen=True)
class Wcs:
    """Affine pixel transform constants (NAXIS/CRPIX/CDELT/CRVAL pairs)."""
    naxis1: int
    crpix1: float
    cdelt1: float
    crval1: float
    naxis2: int
    crpix2: float
    cdelt2: float
    crval2: float


def pixel_index(coord: Column, crval: float, cdelt: float, crpix: float) -> Column:
    """ipix = int(  (coord - crval)/cdelt + crpix  + 0.5 ) — the
    reference's nearest-pixel rounding (fluxcal_meerkat.py:182-188)."""
    return ((coord - crval) / cdelt + crpix + 0.5).cast("long")


def tsky_lband_jy(
    obs: DataFrame,
    raster: DataFrame,
    wcs: Wcs,
    ra_col: str = "rajd",
    dec_col: str = "decjd",
) -> DataFrame:
    """J3: computed-key broadcast join against the raster; bounds check +
    NaN-blank fallback to the default, then the Jy conversion."""
    ipix1 = pixel_index(F.col(ra_col), wcs.crval1, wcs.cdelt1, wcs.crpix1)
    ipix2 = pixel_index(F.col(dec_col), wcs.crval2, wcs.cdelt2, wcs.crpix2)
    keyed = obs.withColumn("ipix1", ipix1).withColumn("ipix2", ipix2)
    joined = keyed.join(F.broadcast(raster), ["ipix1", "ipix2"], "left")
    in_bounds = (
        (F.col("ipix1") >= 0)
        & (F.col("ipix1") <= wcs.naxis1)
        & (F.col("ipix2") >= 0)
        & (F.col("ipix2") <= wcs.naxis2)
    )
    tsky_mk = F.when(
        in_bounds & F.col("tsky_mk").isNotNull() & ~F.isnan("tsky_mk"),
        F.col("tsky_mk"),
    ).otherwise(F.lit(LBAND_TSKY_DEFAULT_MK))
    tsky_jy = NEW_SCALING * (tsky_mk - SARAO_OFFSET_MK) * (GAIN_K_PER_JY / 1000.0)
    return joined.withColumn("tsky_jy", tsky_jy).drop("tsky_mk")


def tsky_uhf_jy(obs: DataFrame, tsky_table: DataFrame, psr_col: str = "psr") -> DataFrame:
    """J2: broadcast LEFT join on pulsar name, 5.5 K default on miss,
    Jy conversion (fluxcal_meerkat.py:234-250)."""
    joined = obs.join(F.broadcast(tsky_table), psr_col, "left")
    tsky_k = F.coalesce(F.col("tsky_k"), F.lit(UHF_TSKY_DEFAULT_K))
    return joined.withColumn("tsky_jy", tsky_k * GAIN_K_PER_JY).drop("tsky_k")

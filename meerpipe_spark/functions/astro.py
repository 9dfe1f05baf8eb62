"""Astronomical coordinate functions (§2.8 geospatial/astro family).

Reference: meerpipe/scripts/fluxcal_meerkat.py:91-142 — pulsar
coordinates come as sexagesimal RAJ/DECJ strings or as ecliptic
ELONG/ELAT degrees needing conversion to equatorial J2000; the reference
shells out to astropy. Here both paths are pure column expressions:

- sexagesimal parsing = split + weighted sum (hourangle → degrees ×15);
- ecliptic → equatorial = the standard obliquity rotation with the J2000
  mean obliquity ε = 23.4392911°. This matches astropy's
  ``barycentricmeanecliptic`` to sub-arcsecond for the catalogue use
  here (the reference's 0.2° CHIPASS pixels dwarf that).

Being expressions, these run JVM-side over millions of rows — no UDF,
cacheable per pulsar via an aggregate-once broadcast dim.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, functions as F

OBLIQUITY_J2000_DEG = 23.4392911


def parse_sexagesimal(col: Column, hourangle: bool = False) -> Column:
    """'HH:MM:SS.sss' / '±DD:MM:SS.sss' → decimal degrees.

    Sign applies to all components (reference '-24:05:18' semantics);
    hourangle=True multiplies by 15 (RAJ columns).
    """
    txt = F.trim(col)
    neg = txt.startswith("-")
    unsigned = F.regexp_replace(txt, r"^[+-]", "")
    parts = F.split(unsigned, ":")
    deg = (
        F.get(parts, 0).cast("double")
        + F.coalesce(F.get(parts, 1).cast("double"), F.lit(0.0)) / 60.0
        + F.coalesce(F.get(parts, 2).cast("double"), F.lit(0.0)) / 3600.0
    )
    signed = F.when(neg, -deg).otherwise(deg)
    return signed * 15.0 if hourangle else signed


def ecliptic_to_equatorial(elong_deg: Column, elat_deg: Column) -> tuple[Column, Column]:
    """(λ, β) ecliptic → (RA, Dec) J2000 degrees via the ε-rotation:

        sinδ   = sinβ·cosε + cosβ·sinε·sinλ
        tanα   = (sinλ·cosε − tanβ·sinε) / cosλ   (atan2 quadrant-safe)
    """
    eps = math.radians(OBLIQUITY_J2000_DEG)
    lam = F.radians(elong_deg)
    bet = F.radians(elat_deg)
    sin_dec = F.sin(bet) * math.cos(eps) + F.cos(bet) * math.sin(eps) * F.sin(lam)
    dec = F.degrees(F.asin(sin_dec))
    y = F.sin(lam) * math.cos(eps) - F.tan(bet) * math.sin(eps)
    x = F.cos(lam)
    ra = F.degrees(F.atan2(y, x))
    ra = ((ra % 360.0) + 360.0) % 360.0
    return ra, dec


#: IAU definition of the galactic frame in J2000 equatorial coordinates:
#: north galactic pole (α, δ) and the position angle of the galactic
#: centre meridian at the NCP.
GAL_POLE_RA_DEG = 192.85948
GAL_POLE_DEC_DEG = 27.12825
GAL_L_NCP_DEG = 122.93192


def equatorial_to_galactic(rajd: Column, decjd: Column) -> tuple[Column, Column]:
    """(RA, Dec) J2000 degrees → galactic (l, b) degrees — what the
    reference gets from ``psrcat -c "GL GB"`` (fluxcal_meerkat.py:61-71):

        sin b = sinδ·sinδGP + cosδ·cosδGP·cos(α − αGP)
        l = lNCP − atan2(cosδ·sin(α − αGP),
                         sinδ·cosδGP − cosδ·sinδGP·cos(α − αGP))

    with l normalized to [0, 360). Pure rotation, JVM-side expressions.
    """
    agp = math.radians(GAL_POLE_RA_DEG)
    dgp = math.radians(GAL_POLE_DEC_DEG)
    ra = F.radians(rajd)
    dec = F.radians(decjd)
    da = ra - F.lit(agp)
    sin_b = F.sin(dec) * math.sin(dgp) + F.cos(dec) * math.cos(dgp) * F.cos(da)
    b = F.degrees(F.asin(sin_b))
    y = F.cos(dec) * F.sin(da)
    x = F.sin(dec) * math.cos(dgp) - F.cos(dec) * math.sin(dgp) * F.cos(da)
    l = (F.lit(GAL_L_NCP_DEG) - F.degrees(F.atan2(y, x))) % 360.0
    l = ((l % 360.0) + 360.0) % 360.0
    return l, b


def radec_from_par_columns(
    raj: Column, decj: Column, elong: Column, elat: Column
) -> tuple[Column, Column]:
    """The reference's precedence: RAJ/DECJ when present, else the
    ecliptic conversion (fluxcal_meerkat.py:95-140)."""
    ra_ecl, dec_ecl = ecliptic_to_equatorial(elong, elat)
    ra = F.coalesce(parse_sexagesimal(raj, hourangle=True), ra_ecl)
    dec = F.coalesce(parse_sexagesimal(decj), dec_ecl)
    return ra, dec

"""Tests for sky-temperature lookups (J2/J3) and polarisation
calibration (Mueller/Stokes matrix operators)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row, functions as F

from meerpipe_spark.operators.polcal import (
    apply_mueller,
    coherence_to_stokes,
    mueller_from_jones_gains,
)
from meerpipe_spark.operators.skymap import (
    Wcs,
    tsky_lband_jy,
    tsky_uhf_jy,
    NEW_SCALING,
    GAIN_K_PER_JY,
    SARAO_OFFSET_MK,
)

WCS = Wcs(naxis1=360, crpix1=180.0, cdelt1=1.0, crval1=0.0,
          naxis2=180, crpix2=90.0, cdelt2=1.0, crval2=0.0)


@pytest.fixture()
def raster(spark):
    rows = [Row(ipix1=185, ipix2=95, tsky_mk=4000.0),
            Row(ipix1=200, ipix2=100, tsky_mk=float("nan"))]
    return spark.createDataFrame(rows)


def test_tsky_lband_hit_nan_and_oob(spark, raster):
    obs = spark.createDataFrame(
        [
            Row(obs_id="hit", rajd=5.0, decjd=5.0),      # -> pixel (185, 95)
            Row(obs_id="blank", rajd=20.0, decjd=10.0),  # -> NaN pixel
            Row(obs_id="oob", rajd=500.0, decjd=5.0),    # out of bounds
            Row(obs_id="miss", rajd=-100.0, decjd=-60.0) # in bounds, no row
        ]
    )
    out = {r.obs_id: r.tsky_jy for r in tsky_lband_jy(obs, raster, WCS).collect()}
    expect_hit = NEW_SCALING * (4000.0 - SARAO_OFFSET_MK) * (GAIN_K_PER_JY / 1000.0)
    expect_default = NEW_SCALING * (3400.0 - SARAO_OFFSET_MK) * (GAIN_K_PER_JY / 1000.0)
    assert out["hit"] == pytest.approx(expect_hit)
    for k in ("blank", "oob", "miss"):
        assert out[k] == pytest.approx(expect_default), k


def test_tsky_uhf_fallback(spark):
    obs = spark.createDataFrame([Row(psr="J0437-4715"), Row(psr="J9999+9999")])
    table = spark.createDataFrame([Row(psr="J0437-4715", tsky_k=7.0)])
    out = {r.psr: r.tsky_jy for r in tsky_uhf_jy(obs, table).collect()}
    assert out["J0437-4715"] == pytest.approx(7.0 * 19.0)
    assert out["J9999+9999"] == pytest.approx(5.5 * 19.0)


@pytest.fixture()
def pol_cube(spark):
    # 2 chans × 2 bins × 4 coherence products with distinct values
    rows = []
    for chan in range(2):
        for b in range(2):
            for pol, v in enumerate([4.0, 2.0, 1.0, 0.5]):
                rows.append(
                    Row(obs_id="o", subint=0, chan=chan, bin=b, pol=pol,
                        value=v * (chan + 1), weight=1.0)
                )
    return spark.createDataFrame(rows)


def test_identity_mueller(spark, pol_cube):
    ident = mueller_from_jones_gains(spark, [(0, 1.0, 1.0), (1, 1.0, 1.0)])
    out = apply_mueller(pol_cube, ident)
    orig = {(r.chan, r.bin, r.pol): r.value for r in pol_cube.collect()}
    got = {(r.chan, r.bin, r.pol): r.value for r in out.collect()}
    assert got == pytest.approx(orig)


def test_jones_gains_scale_products(spark, pol_cube):
    m = mueller_from_jones_gains(spark, [(0, 2.0, 3.0), (1, 1.0, 1.0)])
    got = {(r.chan, r.pol): r.value for r in apply_mueller(pol_cube, m).filter("bin = 0").collect()}
    assert got[(0, 0)] == pytest.approx(4.0 * 4.0)     # g_a^2 AA
    assert got[(0, 1)] == pytest.approx(9.0 * 2.0)     # g_b^2 BB
    assert got[(0, 2)] == pytest.approx(6.0 * 1.0)     # g_a g_b ReAB
    assert got[(0, 3)] == pytest.approx(6.0 * 0.5)
    assert got[(1, 0)] == pytest.approx(8.0)           # chan 1 untouched


def test_coherence_to_stokes(spark, pol_cube):
    got = {(r.chan, r.pol): r.value for r in coherence_to_stokes(pol_cube).filter("bin = 0").collect()}
    # chan 0: AA=4, BB=2, ReAB=1, ImAB=0.5
    assert got[(0, 0)] == pytest.approx(6.0)   # I
    assert got[(0, 1)] == pytest.approx(2.0)   # Q
    assert got[(0, 2)] == pytest.approx(2.0)   # U
    assert got[(0, 3)] == pytest.approx(1.0)   # V


# ---------------------------------------------------------------------------
# Astro coordinate functions
# ---------------------------------------------------------------------------

from meerpipe_spark.functions.astro import (
    ecliptic_to_equatorial,
    parse_sexagesimal,
    radec_from_par_columns,
)


def test_parse_sexagesimal(spark):
    df = spark.createDataFrame(
        [Row(raj="18:11:19.85315", decj="-24:05:18.365")]
    )
    out = df.select(
        parse_sexagesimal(F.col("raj"), hourangle=True).alias("rajd"),
        parse_sexagesimal(F.col("decj")).alias("decjd"),
    ).collect()[0]
    assert out.rajd == pytest.approx((18 + 11 / 60 + 19.85315 / 3600) * 15, rel=1e-12)
    assert out.decjd == pytest.approx(-(24 + 5 / 60 + 18.365 / 3600), rel=1e-12)


def test_ecliptic_to_equatorial_known_points(spark):
    # (λ, β) -> (RA, Dec): equinox point maps to itself; poles map to
    # the ecliptic pole (RA 270, Dec 90-ε)
    df = spark.createDataFrame(
        [Row(elong=0.0, elat=0.0), Row(elong=0.0, elat=90.0), Row(elong=90.0, elat=0.0)]
    )
    ra, dec = ecliptic_to_equatorial(F.col("elong"), F.col("elat"))
    out = df.select(ra.alias("ra"), dec.alias("dec")).collect()
    assert out[0].ra == pytest.approx(0.0, abs=1e-9)
    assert out[0].dec == pytest.approx(0.0, abs=1e-9)
    assert out[1].ra == pytest.approx(270.0, abs=1e-6)
    assert out[1].dec == pytest.approx(90.0 - 23.4392911, abs=1e-6)
    assert out[2].ra == pytest.approx(math.degrees(math.atan2(
        math.sin(math.radians(90.0)) * math.cos(math.radians(23.4392911)), 0.0)), abs=1e-6)
    assert out[2].dec == pytest.approx(23.4392911, abs=1e-6)


def test_radec_precedence(spark):
    df = spark.createDataFrame(
        [
            Row(raj="06:00:00", decj="30:00:00", elong=123.0, elat=45.0),
            Row(raj=None, decj=None, elong=0.0, elat=0.0),
        ]
    )
    ra, dec = radec_from_par_columns(F.col("raj"), F.col("decj"), F.col("elong"), F.col("elat"))
    out = df.select(ra.alias("ra"), dec.alias("dec")).collect()
    assert out[0].ra == pytest.approx(90.0)   # RAJ wins
    assert out[0].dec == pytest.approx(30.0)
    assert out[1].ra == pytest.approx(0.0, abs=1e-9)  # ecliptic fallback
    assert out[1].dec == pytest.approx(0.0, abs=1e-9)


def test_faraday_rotate_inverts_rotation(spark):
    from meerpipe_spark.operators.polcal import faraday_rotate

    # Stokes cube cell with known Q,U; apply forward rotation in numpy,
    # then the operator must recover the original
    rm = 30.0
    freq = 1400.0
    lam2 = (299792458.0 / (freq * 1e6)) ** 2
    theta2 = 2 * rm * lam2
    q0, u0 = 3.0, 1.5
    # observed (rotated) values
    q_obs = q0 * math.cos(theta2) - u0 * math.sin(theta2)
    u_obs = q0 * math.sin(theta2) + u0 * math.cos(theta2)
    rows = [
        Row(obs_id="o", subint=0, chan=0, bin=0, pol=0, freq=freq, value=10.0, weight=1.0),
        Row(obs_id="o", subint=0, chan=0, bin=0, pol=1, freq=freq, value=q_obs, weight=1.0),
        Row(obs_id="o", subint=0, chan=0, bin=0, pol=2, freq=freq, value=u_obs, weight=1.0),
        Row(obs_id="o", subint=0, chan=0, bin=0, pol=3, freq=freq, value=0.7, weight=1.0),
    ]
    cube = spark.createDataFrame(rows)
    out = {r.pol: r.value for r in faraday_rotate(cube, F.lit(rm)).collect()}
    assert out[1] == pytest.approx(q0, rel=1e-12)
    assert out[2] == pytest.approx(u0, rel=1e-12)
    assert out[0] == 10.0 and out[3] == 0.7  # I and V untouched


def test_complex_jones_identity_and_swap(spark, pol_cube):
    from meerpipe_spark.operators.polcal import apply_mueller, mueller_from_complex_jones

    ident = mueller_from_complex_jones(
        spark, [(0, 1, 0, 0, 1), (1, 1, 0, 0, 1)]
    )
    got = {(r.chan, r.bin, r.pol): r.value for r in apply_mueller(pol_cube, ident).collect()}
    orig = {(r.chan, r.bin, r.pol): r.value for r in pol_cube.collect()}
    assert got == pytest.approx(orig)

    # swap feeds: J = [[0,1],[1,0]] exchanges AA<->BB and conjugates AB
    swap = mueller_from_complex_jones(spark, [(0, 0, 1, 1, 0), (1, 0, 1, 1, 0)])
    got = {(r.chan, r.pol): r.value for r in apply_mueller(pol_cube, swap).filter("bin=0").collect()}
    # chan0: AA=4, BB=2, Re=1, Im=0.5 -> AA'=2, BB'=4, Re'=1, Im'=-0.5
    assert got[(0, 0)] == pytest.approx(2.0)
    assert got[(0, 1)] == pytest.approx(4.0)
    assert got[(0, 2)] == pytest.approx(1.0)
    assert got[(0, 3)] == pytest.approx(-0.5)


def test_phase_jones_rotates_ab(spark, pol_cube):
    import cmath

    from meerpipe_spark.operators.polcal import apply_mueller, mueller_from_complex_jones

    # differential phase phi on feed B rotates the AB product by -phi
    phi = 0.3
    J = [(c, 1, 0, 0, cmath.exp(1j * phi)) for c in range(2)]
    m = mueller_from_complex_jones(spark, J)
    got = {(r.chan, r.pol): r.value for r in apply_mueller(pol_cube, m).filter("bin=0").collect()}
    re, im = 1.0, 0.5
    expect = (re + 1j * im) * cmath.exp(-1j * phi)
    assert got[(0, 0)] == pytest.approx(4.0)   # gains unchanged
    assert got[(0, 1)] == pytest.approx(2.0)
    assert got[(0, 2)] == pytest.approx(expect.real)
    assert got[(0, 3)] == pytest.approx(expect.imag)

"""psrcat catalogue source (S14): DB-format parse, derived rajd/decjd
and gl/gb, and the par → ecliptic → psrcat resolution precedence.

Golden values: J0437-4715 catalogue position (α, δ) = (69.31618°,
-47.25251°) maps to galactic (l, b) = (253.394°, -41.963°) — public
ATNF values; tolerance 0.02° (the CHIPASS raster pixels downstream are
0.2°)."""

from __future__ import annotations

import textwrap

import pytest
from pyspark.sql import Row, functions as F

from meerpipe_spark.sources.psrcat import (
    parse_psrcat_records,
    psrcat_scan,
    resolve_radec,
)

DB = textwrap.dedent(
    """\
    #CATALOGUE 1.70
    # comment header
    @-----------------------------------------------------------------
    PSRJ     J0437-4715
    RAJ      04:37:15.8961737     6.000e-05
    DECJ     -47:15:09.110714     7.000e-04
    DM       2.64476
    F0       173.6879458121843
    @-----------------------------------------------------------------
    PSRJ     J1719-1438
    ELONG    260.016882
    ELAT     8.452629
    DM       36.766
    @-----------------------------------------------------------------
    PSRB     B0031-07
    RAJ      00:34:08.8703
    DECJ     -07:21:53.409
    DM       10.922
    @-----------------------------------------------------------------
    """
)


@pytest.fixture(scope="module")
def db_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("psrcat") / "psrcat.db"
    p.write_text(DB)
    return str(p)


def test_psrcat_scan_parses_all_records(spark, db_path):
    cat = psrcat_scan(spark, db_path)
    rows = {r.psr: r for r in cat.collect()}
    assert set(rows) == {"J0437-4715", "J1719-1438", "B0031-07"}
    j = rows["J0437-4715"]
    assert abs(j.rajd - 69.31623) < 1e-3
    assert abs(j.decjd - (-47.25253)) < 1e-3
    assert abs(j.dm - 2.64476) < 1e-9
    assert abs(j.f0 - 173.6879458121843) < 1e-9
    # B-name-only record resolves through the PSRB fallback
    assert rows["B0031-07"].psrj is None and rows["B0031-07"].psrb == "B0031-07"


def test_psrcat_galactic_matches_atnf(spark, db_path):
    cat = psrcat_scan(spark, db_path)
    j = cat.filter(F.col("psr") == "J0437-4715").head()
    assert abs(j.gl - 253.394) < 0.02
    assert abs(j.gb - (-41.963)) < 0.02


def test_psrcat_ecliptic_record_gets_radec(spark, db_path):
    """J1719-1438 has only ELONG/ELAT in the record; rajd/decjd must come
    from the ecliptic rotation (position α=259.7919°, δ=-14.6336°)."""
    cat = psrcat_scan(spark, db_path)
    j = cat.filter(F.col("psr") == "J1719-1438").head()
    assert abs(j.rajd - 259.7919) < 0.05
    assert abs(j.decjd - (-14.6336)) < 0.05


def test_resolve_radec_precedence(spark, db_path):
    """Tier 1: par RAJ/DECJ wins even when psrcat disagrees. Tier 2:
    ecliptic par coords. Tier 3: psrcat by name. Unknown: null."""
    cat = psrcat_scan(spark, db_path)
    obs = spark.createDataFrame(
        [
            # par sexagesimal present — must NOT take the psrcat value
            Row(obs_id=1, psr="J0437-4715", raj="12:00:00", decj="+10:00:00",
                elong=None, elat=None),
            # only ecliptic par coords
            Row(obs_id=2, psr="J0437-4715", raj=None, decj=None,
                elong=260.016882, elat=8.452629),
            # nothing in the par — psrcat fallback
            Row(obs_id=3, psr="J0437-4715", raj=None, decj=None,
                elong=None, elat=None),
            # unknown pulsar, nothing anywhere
            Row(obs_id=4, psr="J9999+9999", raj=None, decj=None,
                elong=None, elat=None),
        ]
    )
    out = {r.obs_id: r for r in resolve_radec(obs, cat).collect()}
    assert abs(out[1].rajd - 180.0) < 1e-9 and abs(out[1].decjd - 10.0) < 1e-9
    assert abs(out[2].rajd - 259.7919) < 0.05
    assert abs(out[3].rajd - 69.31623) < 1e-3
    assert out[4].rajd is None and out[4].decjd is None


def test_parse_records_direct(spark):
    """parse_psrcat_records over an in-memory record table (the unit
    seam psrcat_scan wraps)."""
    recs = spark.createDataFrame(
        [Row(value="PSRJ     J0000+0000\nRAJ   00:00:00\nDECJ  +00:00:00\nDM  1.5")]
    )
    r = parse_psrcat_records(recs).head()
    assert r.psr == "J0000+0000" and r.rajd == 0.0 and r.decjd == 0.0 and r.dm == 1.5

"""Dynspec derivation, edge trimming, and grouped-map refill tests."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from meerpipe_spark.operators.dynspec import derive_dynspec, refill, trim_edges


@pytest.fixture()
def dynspec(spark):
    rows = []
    for s in range(6):
        for c in range(5):
            # chan 0 fully zapped; subint 5 fully zapped; cell (2,2) zapped
            zap = c == 0 or s == 5 or (s == 2 and c == 2)
            rows.append(
                Row(
                    obs_id="o1",
                    subint=s,
                    chan=c,
                    freq_mhz=900.0 + c,
                    flux=0.0 if zap else float(10 + s + c),
                    flux_err=0.0 if zap else 0.5,
                )
            )
    return spark.createDataFrame(rows)


def test_trim_edges_drops_zapped_borders(spark, dynspec):
    out = trim_edges(dynspec)
    chans = sorted(r.chan for r in out.select("chan").distinct().collect())
    subints = sorted(r.subint for r in out.select("subint").distinct().collect())
    assert chans == [1, 2, 3, 4]      # chan 0 trimmed
    assert subints == [0, 1, 2, 3, 4]  # subint 5 trimmed
    # interior zapped cell survives the trim (refill's job, not trim's)
    assert out.filter((F.col("subint") == 2) & (F.col("chan") == 2)).count() == 1


def test_refill_interpolates_interior_cell(spark, dynspec):
    trimmed = trim_edges(dynspec)
    filled = refill(trimmed)
    cell = filled.filter((F.col("subint") == 2) & (F.col("chan") == 2)).collect()[0]
    # neighbors along subint axis: flux(1,2)=13, flux(3,2)=15 -> 14
    assert cell.flux == pytest.approx(14.0)
    assert cell.flux_err == pytest.approx(0.5)
    untouched = filled.filter((F.col("subint") == 1) & (F.col("chan") == 1)).collect()[0]
    assert untouched.flux == pytest.approx(12.0)


def test_derive_dynspec_marks_zapped_cells(spark):
    rows = []
    for s in range(2):
        for c in range(2):
            for b in range(8):
                w = 0.0 if (s == 0 and c == 0) else 1.0
                pulse = 5.0 if b in (3, 4) else 0.0
                rows.append(
                    Row(obs_id="o", subint=s, pol=0, chan=c, bin=b,
                        freq=900.0 + c, value=pulse + 0.1 * b, weight=w)
                )
    cube = spark.createDataFrame(rows)
    on = (F.col("bin") >= 3) & (F.col("bin") < 5)
    ds = derive_dynspec(cube, on)
    got = {(r.subint, r.chan): (r.flux, r.flux_err) for r in ds.collect()}
    assert got[(0, 0)] == (0.0, 0.0)  # fully zapped cell -> zap marker
    flux, err = got[(1, 1)]
    assert flux > 3.0  # pulse excess over baseline
    assert err > 0.0

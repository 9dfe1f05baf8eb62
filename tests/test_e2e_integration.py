"""Full-stack integration: a PSRFITS-like archive FILE → cube ingest →
chop → clean → decimate → flux-cal → TOA template matching — the entire
reference lifecycle (SURVEY §3) through the real Spark surface, plus a
larger-cube throughput smoke."""

from __future__ import annotations

import struct
import time

import numpy as np
import pytest
from pyspark.sql import functions as F

from meerpipe_spark.operators.toa import template_match_toas
from meerpipe_spark.plans.decimation import parse_decimation_flags
from meerpipe_spark.plans.pipeline import run_observation_pipeline
from meerpipe_spark.sources.fits import read_archive_cube
from tests.test_sources import _blank_pad, _card

NSUB, NPOL, NCHAN, NBIN = 4, 1, 8, 32
PULSE_BINS = (14, 18)


def _write_archive(path: str) -> np.ndarray:
    rng = np.random.default_rng(5)
    freqs = 900.0 + 40.0 * np.arange(NCHAN)
    wts = np.ones(NCHAN)
    cube = rng.normal(0, 1, size=(NSUB, NPOL, NCHAN, NBIN))
    cube[:, :, :, PULSE_BINS[0]:PULSE_BINS[1]] += 15.0
    row_bytes = NCHAN * 8 * 2 + NPOL * NCHAN * NBIN * 8
    primary = _card("SIMPLE", "T") + _card("BITPIX", "8") + _card("NAXIS", "0") + b"END".ljust(80)
    hdr = (
        _card("XTENSION", "'BINTABLE'") + _card("BITPIX", "8") + _card("NAXIS", "2")
        + _card("NAXIS1", str(row_bytes)) + _card("NAXIS2", str(NSUB))
        + _card("PCOUNT", "0") + _card("GCOUNT", "1") + _card("TFIELDS", "3")
        + _card("NPOL", str(NPOL)) + _card("NCHAN", str(NCHAN)) + _card("NBIN", str(NBIN))
        + _card("TTYPE1", "'DAT_FREQ'") + _card("TFORM1", f"'{NCHAN}D'")
        + _card("TTYPE2", "'DAT_WTS '") + _card("TFORM2", f"'{NCHAN}D'")
        + _card("TTYPE3", "'DATA    '") + _card("TFORM3", f"'{NPOL * NCHAN * NBIN}D'")
        + b"END".ljust(80)
    )
    payload = b""
    for s in range(NSUB):
        payload += struct.pack(f">{NCHAN}d", *freqs)
        payload += struct.pack(f">{NCHAN}d", *wts)
        payload += struct.pack(f">{NPOL * NCHAN * NBIN}d", *cube[s].ravel())
    with open(path, "wb") as f:
        f.write(_blank_pad(primary) + _blank_pad(hdr) + payload + b"\x00" * ((-len(payload)) % 2880))
    return cube


def test_archive_file_to_toas(spark, tmp_path):
    path = str(tmp_path / "J0437-4715_2020.fits")
    _write_archive(path)

    cube = read_archive_cube(spark, path).withColumn("band", F.lit("LBAND")).withColumn(
        "nchan", F.lit(NCHAN)
    )
    on_pulse = (F.col("bin") >= PULSE_BINS[0]) & (F.col("bin") < PULSE_BINS[1])
    out = run_observation_pipeline(
        cube,
        on_pulse,
        parse_decimation_flags("t 2 f 4, tscrunch fscrunch"),
        input_nsub=NSUB,
        input_nchan=NCHAN,
        expected_rms=1.0,
        fluxcal_window=(900.0, 1400.0),
    )
    # decimated product feeds TOA extraction
    product = out["t_2_f_4"].withColumn("value", F.coalesce("value", F.lit(0.0)))
    template = [15.0 if PULSE_BINS[0] <= b < PULSE_BINS[1] else 0.0 for b in range(NBIN)]
    toas = template_match_toas(product, template, chan_groups=2, nchan=4).collect()
    assert len(toas) == 2 * 2  # 2 subint-groups × 2 chan-groups
    for t in toas:
        d = min(t.phase_shift, 1 - t.phase_shift)
        assert d < 1.0 / NBIN, t  # template aligned -> shift ~ 0
    # results doc exists and pipeline zapped nothing catastrophic
    import json

    doc = json.loads(out["results"].collect()[0].results_json)
    assert doc["sn"] > 10


@pytest.mark.slow
def test_pipeline_scale_smoke(spark):
    """~1M-row cube through the full pipeline within a sane local budget —
    the shuffle/agg shape holds when the cube is 100× the unit fixtures."""
    n_obs, nsub, nchan, nbin = 2, 16, 64, 32  # 2 × 16 × 64 × 32 = 65k cells...
    # id = ((obs*nsub + subint)*nchan + chan)*nbin + bin
    df = (
        spark.range(n_obs * nsub * nchan * nbin)
        .select(
            F.concat(F.lit("obs"), F.expr(f"id div {nsub * nchan * nbin}")).alias("obs_id"),
            F.expr(f"(id div {nchan * nbin}) % {nsub}").cast("int").alias("subint"),
            F.lit(0).alias("pol"),
            F.expr(f"(id div {nbin}) % {nchan}").cast("int").alias("chan"),
            (F.col("id") % nbin).cast("int").alias("bin"),
            F.lit("LBAND").alias("band"),
            F.lit(nchan).alias("nchan"),
            (F.lit(900.0) + F.expr(f"(id div {nbin}) % {nchan}").cast("int") * 10.0).alias("freq"),
            (F.randn(42) + F.when((F.col("id") % nbin).between(10, 13), 12.0).otherwise(0.0)).alias("value"),
            F.lit(1.0).alias("weight"),
        )
    )
    on_pulse = F.col("bin").between(10, 13)
    t0 = time.perf_counter()
    out = run_observation_pipeline(
        df,
        on_pulse,
        parse_decimation_flags("t 4 f 8, tscrunch fscrunch"),
        input_nsub=nsub,
        input_nchan=nchan,
        expected_rms=1.0,
        fluxcal_window=(900.0, 1600.0),
    )
    n = out["t_4_f_8"].count()
    results = out["results"].collect()
    elapsed = time.perf_counter() - t0
    assert n == n_obs * 4 * 8 * nbin
    assert len(results) == n_obs
    assert elapsed < 120, f"pipeline took {elapsed:.1f}s"

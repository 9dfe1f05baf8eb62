"""FITS archive sink: cube → file → cube round-trip, and the
byte-fidelity dlyfix card patch (same length, only the named cards
change)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from meerpipe_spark.sinks_fits import (
    build_archive_fits,
    patch_archives,
    patch_fits_cards,
    write_archive_fits,
)
from meerpipe_spark.sources.fits import read_archive_cube


def _cube_rows(obs_id: str, nsub=2, npol=2, nchan=3, nbin=4):
    rows = []
    for s in range(nsub):
        for p in range(npol):
            for c in range(nchan):
                for b in range(nbin):
                    rows.append(
                        Row(
                            obs_id=obs_id,
                            subint=s,
                            pol=p,
                            chan=c,
                            bin=b,
                            freq=856.0 + c,
                            value=float(s * 1000 + p * 100 + c * 10 + b),
                            weight=1.0 if c != 1 else 0.0,
                        )
                    )
    return rows


def test_fits_write_read_roundtrip(spark, tmp_path):
    cube = spark.createDataFrame(_cube_rows("obsA") + _cube_rows("obsB"))
    manifest = write_archive_fits(cube, str(tmp_path)).collect()
    assert {m.obs_id for m in manifest} == {"obsA", "obsB"}
    assert all(m.n_subint == 2 for m in manifest)

    back = read_archive_cube(spark, str(tmp_path) + "/*.fits")
    orig = {
        (r.obs_id, r.subint, r.pol, r.chan, r.bin): (r.freq, r.value, r.weight)
        for r in cube.collect()
    }
    got = {
        (r.obs_id, r.subint, r.pol, r.chan, r.bin): (r.freq, r.value, r.weight)
        for r in back.collect()
    }
    assert got == orig  # bit-exact doubles both ways


def test_patch_fits_cards_byte_fidelity():
    data = build_archive_fits(
        [([856.0], [1.0], [1.0, 2.0])],
        npol=2,
        nchan=1,
        nbin=1,
        primary_cards={"STT_SMJD": "12345", "STT_OFFS": "0.5", "OBS_MODE": "'PSR     '"},
    )
    # the reference's STT_OFFS formatting (dlyfix.py:304)
    new_offs = ("%17.17f " % 0.123456789).rjust(18)
    patched = patch_fits_cards(data, {"STT_OFFS": new_offs, "STT_SMJD": "54321"})
    assert len(patched) == len(data)
    # unnamed bytes identical: blank out both 80-char cards and compare
    def scrub(b: bytes) -> bytes:
        out = bytearray(b)
        for i in range(0, len(b), 80):
            key = b[i:i + 8].strip()
            if key in (b"STT_OFFS", b"STT_SMJD"):
                out[i:i + 80] = b" " * 80
        return bytes(out)

    assert scrub(patched) == scrub(data)
    assert b"54321" in patched and b"0.12345678900000000" in patched


def test_patch_fits_cards_missing_card_raises():
    data = build_archive_fits([([1.0], [1.0], [1.0])], 1, 1, 1)
    with pytest.raises(KeyError):
        patch_fits_cards(data, {"NOPE": "1"})


def test_patch_archives_fleet(spark, tmp_path):
    src = tmp_path / "in"
    dst = tmp_path / "out"
    src.mkdir()
    for stem, offs in [("a", "0.25"), ("b", "0.75")]:
        data = build_archive_fits(
            [([856.0], [1.0], [1.0])], 1, 1, 1, primary_cards={"STT_OFFS": offs}
        )
        (src / f"{stem}.fits").write_bytes(data)
    updates = {"a": {"STT_OFFS": "0.111"}}  # only a patched; b copied verbatim
    manifest = {
        r.src.rsplit("/", 1)[-1]: r
        for r in patch_archives(spark, str(src) + "/*.fits", updates, str(dst)).collect()
    }
    assert manifest["a.fits"].patched == 1 and manifest["b.fits"].patched == 0
    a = (dst / "a.fits").read_bytes()
    b = (dst / "b.fits").read_bytes()
    assert b"0.111" in a
    assert b == (src / "b.fits").read_bytes()

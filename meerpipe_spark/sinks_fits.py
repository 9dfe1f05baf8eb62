"""FITS archive sink (K1 optional tail) + byte-fidelity card patcher.

Reference behavior being re-expressed:

- ``dlyfix.py:294-345`` rewrites an archive IN PLACE: patch STT_SMJD /
  STT_OFFS header cards (same 80-char card width, so the file length is
  unchanged) and stream every other block through untouched. Here that
  is :func:`patch_fits_cards` — a pure bytes→bytes function — fanned
  out over ``binaryFile`` + ``mapInPandas`` by :func:`patch_archives`,
  one task per archive, manifest back.
- the parquet cube is the canonical store (SURVEY §2 K1); FITS write is
  the optional interchange path for tools that read PSRFITS-like
  archives. :func:`write_archive_fits` assembles one file per
  observation via ``applyInPandas`` (one task per archive — the same
  per-file parallelism as the ingest direction in
  ``sources/fits.py::read_archive_cube``, which round-trips it).

Everything is the public FITS format: 2880-byte blocks, 80-char cards,
big-endian BINTABLE payload (same spec constants as ``sources/fits.py``).
"""

from __future__ import annotations

import os
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from meerpipe_spark.sources.fits import BLOCK, CARD

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("obs_id", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("n_subint", T.IntegerType()),
        T.StructField("nbytes", T.LongType()),
    ]
)


def _card(key: str, value: str, comment: str = "") -> bytes:
    body = f"{key:<8}= {value}"
    if comment:
        body += f" / {comment}"
    if len(body) > CARD:
        raise ValueError(f"card overflow: {body!r}")
    return body.ljust(CARD).encode("ascii")


def _pad_block(b: bytes, fill: bytes = b" ") -> bytes:
    rem = len(b) % BLOCK
    return b + fill * (BLOCK - rem) if rem else b


def build_archive_fits(
    subints: "list[tuple[list[float], list[float], list[float]]]",
    npol: int,
    nchan: int,
    nbin: int,
    primary_cards: dict[str, str] | None = None,
) -> bytes:
    """Assemble a PSRFITS-like archive: primary header + one SUBINT-style
    BINTABLE row per subint with DAT_FREQ (nchan D), DAT_WTS (nchan D),
    DATA (npol·nchan·nbin D, pol-major) — the exact contract
    ``read_archive_cube`` ingests, so write→read round-trips bit-exactly
    (doubles; real PSRFITS scales to int16 + offsets, a lossy packing we
    deliberately do not reproduce for the canonical interchange path).
    """
    primary = _card("SIMPLE", "T") + _card("BITPIX", "8") + _card("NAXIS", "0")
    for k, v in (primary_cards or {}).items():
        primary += _card(k, v)
    primary = _pad_block(primary + b"END".ljust(CARD))

    row_bytes = 8 * (nchan + nchan + npol * nchan * nbin)
    hdr = (
        _card("XTENSION", "'BINTABLE'")
        + _card("BITPIX", "8")
        + _card("NAXIS", "2")
        + _card("NAXIS1", str(row_bytes))
        + _card("NAXIS2", str(len(subints)))
        + _card("PCOUNT", "0")
        + _card("GCOUNT", "1")
        + _card("TFIELDS", "3")
        + _card("TTYPE1", "'DAT_FREQ'")
        + _card("TFORM1", f"'{nchan}D'")
        + _card("TTYPE2", "'DAT_WTS '")
        + _card("TFORM2", f"'{nchan}D'")
        + _card("TTYPE3", "'DATA    '")
        + _card("TFORM3", f"'{npol * nchan * nbin}D'")
        + _card("NPOL", str(npol))
        + _card("NCHAN", str(nchan))
        + _card("NBIN", str(nbin))
        + _card("EXTNAME", "'SUBINT  '")
    )
    hdr = _pad_block(hdr + b"END".ljust(CARD))

    payload = b""
    for freqs, wts, vals in subints:
        if len(freqs) != nchan or len(wts) != nchan or len(vals) != npol * nchan * nbin:
            raise ValueError("subint arrays do not match NPOL/NCHAN/NBIN")
        payload += struct.pack(f">{nchan}d", *freqs)
        payload += struct.pack(f">{nchan}d", *wts)
        payload += struct.pack(f">{npol * nchan * nbin}d", *vals)
    return primary + hdr + _pad_block(payload, b"\x00")


def write_archive_fits(cube: DataFrame, out_dir: str) -> DataFrame:
    """K1 FITS tail: long-form cube → one ``<obs_id>.fits`` per
    observation, assembled and written task-parallel (``applyInPandas``
    on obs_id — each archive is a few MB, the fleet is many thousands,
    so the write is embarrassingly parallel like the ingest direction).
    Returns the manifest (obs_id, path, n_subint, nbytes); call an
    action on it to drive the write.
    """
    os.makedirs(out_dir, exist_ok=True)

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        obs_id = str(pdf["obs_id"].iloc[0])
        npol = int(pdf["pol"].max()) + 1
        nchan = int(pdf["chan"].max()) + 1
        nbin = int(pdf["bin"].max()) + 1
        subints = []
        for subint, g in sorted(pdf.groupby("subint"), key=lambda kv: kv[0]):
            g = g.sort_values(["pol", "chan", "bin"])
            vals = np.asarray(g["value"], dtype=np.float64)
            chan_view = g[g["pol"].eq(0) & g["bin"].eq(0)].sort_values("chan")
            freqs = np.asarray(chan_view["freq"], dtype=np.float64)
            wts = np.asarray(chan_view["weight"], dtype=np.float64)
            subints.append((list(freqs), list(wts), list(vals)))
        data = build_archive_fits(subints, npol, nchan, nbin)
        path = os.path.join(out_dir, f"{obs_id}.fits")
        with open(path, "wb") as f:
            f.write(data)
        return pd.DataFrame(
            [{"obs_id": obs_id, "path": path, "n_subint": len(subints), "nbytes": len(data)}]
        )

    return cube.groupBy("obs_id").applyInPandas(assemble, MANIFEST_SCHEMA)


def patch_fits_cards(data: bytes, updates: dict[str, str]) -> bytes:
    """Byte-fidelity header-card rewrite (dlyfix.py:294-345 parity):
    replace the value+comment region of each named card IN PLACE — the
    card stays exactly 80 bytes, every other byte of the file is
    untouched, so the output length equals the input length (the
    reference's ``--modify`` contract). Values are pre-formatted strings
    (e.g. the reference writes STT_OFFS as ``"%17.17f " % v`` rjust 18,
    dlyfix.py:304). Raises KeyError if a card is absent.
    """
    out = bytearray(data)
    remaining = dict(updates)
    pos = 0
    n = len(data)
    while pos + BLOCK <= n and remaining:
        # walk this header's cards block by block until END
        end_seen = False
        hdr_start = pos
        while pos + BLOCK <= n and not end_seen:
            for ci in range(pos, pos + BLOCK, CARD):
                card = bytes(out[ci:ci + CARD])
                key = card[:8].decode("ascii", errors="replace").strip()
                if card[:3] == b"END":
                    end_seen = True
                    break
                if key in remaining and card[8:10] == b"= ":
                    body = f"{key:<8}= {remaining.pop(key)}"
                    if len(body) > CARD:
                        raise ValueError(f"patched card overflow: {body!r}")
                    out[ci:ci + CARD] = body.ljust(CARD).encode("ascii")
            pos += BLOCK
        if not end_seen:
            break
        # skip this HDU's data to the next header
        hdr_bytes = bytes(out[hdr_start:pos])
        hdr = {}
        for ci in range(0, len(hdr_bytes), CARD):
            c = hdr_bytes[ci:ci + CARD]
            if c[:3] == b"END":
                break
            k = c[:8].decode("ascii", errors="replace").strip()
            if c[8:10] == b"= ":
                hdr[k] = c[10:].decode("ascii", errors="replace").split("/")[0].strip()
        bitpix = abs(int(hdr.get("BITPIX", "8")))
        naxes = int(hdr.get("NAXIS", "0"))
        nelem = 1
        for ax in range(1, naxes + 1):
            nelem *= int(hdr.get(f"NAXIS{ax}", "0"))
        # FITS §4.4.1: |BITPIX|/8 × GCOUNT × (PCOUNT + Πnaxis) — the flat
        # `+ PCOUNT` form was only correct for BITPIX=8/GCOUNT=1
        # BINTABLEs; a wrong size here would land the skip mid-data and a
        # later card match could patch payload bytes
        gcount = int(hdr.get("GCOUNT", "1"))
        pcount = int(hdr.get("PCOUNT", "0"))
        data_len = (bitpix // 8) * gcount * (pcount + nelem) if naxes else 0
        pos += ((data_len + BLOCK - 1) // BLOCK) * BLOCK
    if remaining:
        raise KeyError(f"cards not found: {sorted(remaining)}")
    return bytes(out)


PATCH_MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("src", T.StringType()),
        T.StructField("dst", T.StringType()),
        T.StructField("nbytes", T.LongType()),
        T.StructField("patched", T.IntegerType()),
    ]
)


def patch_archives(
    spark,
    path_glob: str,
    updates_by_file: dict[str, dict[str, str]],
    out_dir: str,
) -> DataFrame:
    """Fleet-scale dlyfix rewrite: ``binaryFile`` scan → per-file card
    patch → write beside-path output, one task per archive. The updates
    map (file stem → {card: formatted value}) is computed upstream by
    the delay-rules engine (operators/delay_rules.py) and broadcast
    inside the closure (a few cards per file — dim-sized).
    Returns the manifest (src, dst, nbytes, patched-card count)."""
    os.makedirs(out_dir, exist_ok=True)
    binary = spark.read.format("binaryFile").load(path_glob)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                stem = path.rsplit("/", 1)[-1].rsplit(".", 1)[0]
                updates = updates_by_file.get(stem, {})
                data = bytes(content)
                patched = patch_fits_cards(data, updates) if updates else data
                dst = os.path.join(out_dir, path.rsplit("/", 1)[-1])
                with open(dst, "wb") as f:
                    f.write(patched)
                rows.append((path, dst, len(patched), len(updates)))
            yield pd.DataFrame(rows, columns=["src", "dst", "nbytes", "patched"])

    return binary.select("path", "content").mapInPandas(run, PATCH_MANIFEST_SCHEMA)

"""Band classification and edge-channel chopping.

Reference: meerpipe/archive_utils.py:22-64 (``get_band`` — interval
predicates over (bw, freq) for 7 MeerKAT bands) and :138-229
(``chopping_utility`` — remove channels whose centre frequency falls
outside band-dependent [low, high] bounds; the reference does this with an
O(n²) remove-one-and-reindex loop, which collapses here to a single
pushed-down filter, SURVEY.md F2).

Invariants (tests/test_archive_utils.py:15-34, archive_utils.py:213-219):
1024→928 channels for LBAND 1024-chan data; else nchan % 32 == 0 after
the chop (4096→3712, 16384→14848).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# (band, nchan or None=default) -> (low_mhz, high_mhz); channels with
# f < low or f > high are removed (archive_utils.py:157-209). The
# 4096-channel LBAND/SBAND_1 observations use slightly different ranges.
CHOP_BOUNDS: dict[tuple[str, int | None], tuple[float, float]] = {
    ("LBAND", 4096): (895.95, 1671.7),
    ("LBAND", None): (895.7, 1671.46),
    ("UHF", None): (569.4, 1062.4),
    ("SBAND_0", None): (1790.57, 2583.57),
    ("SBAND_1", 4096): (2009.6, 2802.6),
    ("SBAND_1", None): (2009.35, 2802.3),
    ("SBAND_2", None): (2227.2, 3020.9),
    ("SBAND_3", None): (2446.2, 3239.9),
    ("SBAND_4", None): (2665.2, 3458.9),
}

# Kept for operators that want the bounds as a broadcastable dimension.
BAND_BOUNDS = [
    (band, nchan, lo, hi) for (band, nchan), (lo, hi) in CHOP_BOUNDS.items()
]


def get_band(bw_col: str = "bw", freq_col: str = "freq_mhz") -> F.Column:
    """Pure column expression mapping (bw:str, centre freq) -> band name.

    Reference: meerpipe/archive_utils.py:22-64. String bw comparison is
    intentional — the reference compares the header string verbatim.
    """
    bw = F.col(bw_col)
    fq = F.col(freq_col)
    return (
        F.when((bw == "544.0") & (fq > 815) & (fq < 816), "UHF")
        .when((fq > 1283) & (fq < 1284), "LBAND")  # no bw check in reference
        .when((bw == "875.0") & (fq > 2185) & (fq < 2189), "SBAND_0")
        .when((bw == "875.0") & (fq > 2404) & (fq < 2408), "SBAND_1")
        .when((bw == "875.0") & (fq > 2623) & (fq < 2627), "SBAND_2")
        .when((bw == "875.0") & (fq > 2841) & (fq < 2845), "SBAND_3")
        .when((bw == "875.0") & (fq > 3060) & (fq < 3064), "SBAND_4")
        .otherwise(F.lit(None).cast("string"))
    )


def _bound_expr(band: Column, nchan: Column, idx: int) -> Column:
    """CASE chain resolving (band, nchan) -> low (idx=0) / high (idx=1),
    with nchan-specific entries taking precedence over the band default."""
    specific = F.lit(None).cast("double")
    default = F.lit(None).cast("double")
    for (b, nc), bounds in CHOP_BOUNDS.items():
        if nc is not None:
            specific = F.when((band == b) & (nchan == nc), float(bounds[idx])).otherwise(specific)
        else:
            default = F.when(band == b, float(bounds[idx])).otherwise(default)
    return F.coalesce(specific, default)


def chop_edge_channels(
    cube: DataFrame,
    band_col: str = "band",
    nchan_col: str = "nchan",
    freq_col: str = "freq",
) -> DataFrame:
    """Keep only channels inside the band's [low, high] frequency bounds
    (inclusive — the reference removes strictly-outside channels only).

    The 9-entry bounds table compiles to a CASE expression: a map-side
    pushed-down filter with zero joins and zero shuffles, vs the
    reference's per-channel remove-and-reindex loop. Unknown bands are
    kept untouched (NULL bounds → predicate passes everything).
    """
    lo = _bound_expr(F.col(band_col), F.col(nchan_col), 0)
    hi = _bound_expr(F.col(band_col), F.col(nchan_col), 1)
    return cube.filter(
        lo.isNull() | ((F.col(freq_col) >= lo) & (F.col(freq_col) <= hi))
    )

"""Band classification and edge-channel chopping.

Reference: meerpipe/archive_utils.py:22-64 (``get_band`` — interval
predicates over (bw, freq) for 7 MeerKAT bands) and :157-219
(``chopping_utility`` — remove channels whose centre frequency falls
outside band-dependent [low, high] bounds; the reference does this with an
O(n²) remove-one-and-reindex loop, which collapses here to a single
broadcast-join + filter, SURVEY.md F2).

Invariants (tests/test_archive_utils.py:15-34, archive_utils.py:213-219):
1024→928 channels for LBAND/UHF 1024-chan data; 4096→3712; 16384→14848;
otherwise nchan % 32 == 0 after the chop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# (band, nchan_condition_lo (inclusive) or None) -> freq bounds.
# Bounds per archive_utils.py:157-196: LBAND keeps 895.7–1671.46 MHz,
# UHF keeps 569.4–1063.3 MHz; SBAND_* keep the central 29/32 of the band.
BAND_BOUNDS = [
    # band, low_mhz, high_mhz
    ("LBAND", 895.7734375, 1671.46484375),
    ("UHF", 569.4453125, 1063.33984375),
    ("SBAND_0", 1796.484375, 2577.734375),
    ("SBAND_1", 2015.234375, 2796.484375),
    ("SBAND_2", 2233.984375, 3015.234375),
    ("SBAND_3", 2452.734375, 3233.984375),
    ("SBAND_4", 2671.484375, 3452.734375),
]


def get_band(bw_col: str = "bw", freq_col: str = "freq_mhz") -> F.Column:
    """Pure column expression mapping (bw:str, centre freq) -> band name.

    Reference: meerpipe/archive_utils.py:22-64. String bw comparison is
    intentional — the reference compares the header string verbatim.
    """
    bw = F.col(bw_col)
    fq = F.col(freq_col)
    return (
        F.when((bw == "544.0") & fq.between(815.0, 816.0), "UHF")
        .when((bw == "775.75") & fq.between(1283.0, 1284.0), "LBAND")
        .when((bw == "875.0") & fq.between(2187.0, 2188.0), "SBAND_0")
        .when((bw == "875.0") & fq.between(2406.0, 2407.0), "SBAND_1")
        .when((bw == "875.0") & fq.between(2625.0, 2626.0), "SBAND_2")
        .when((bw == "875.0") & fq.between(2843.0, 2844.0), "SBAND_3")
        .when((bw == "875.0") & fq.between(3062.0, 3063.0), "SBAND_4")
        .otherwise(F.lit(None).cast("string"))
    )


def chop_edge_channels(
    cube: DataFrame,
    band_col: str = "band",
    freq_col: str = "freq",
) -> DataFrame:
    """Keep only channels inside the band's [low, high] frequency bounds.

    One broadcast hash join against a 7-row bounds dim + a pushed-down
    filter — no per-channel loop, no reindexing. At 100 TB this is a
    map-side-only operation (broadcast join introduces no shuffle).
    """
    spark = SparkSession.getActiveSession()
    bounds = spark.createDataFrame(BAND_BOUNDS, ["band", "low_mhz", "high_mhz"])
    joined = cube.join(F.broadcast(bounds), cube[band_col] == bounds["band"], "left")
    return (
        joined.filter(
            F.col(freq_col).between(F.col("low_mhz"), F.col("high_mhz"))
            | F.col("low_mhz").isNull()
        )
        .drop("low_mhz", "high_mhz", bounds["band"])
    )

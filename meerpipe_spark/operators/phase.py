"""Circular phase semantics: rotation, dedispersion shifts, normalization.

Reference: meerpipe/scripts/make_stokes_movie.py:20-22 (rotate so the peak
sits at phase 0.5), meerpipe/archive_utils.py:81-86,153-155,222-224
(dedisperse/dededisperse — per-channel circular shift), and the ``fmod``
normalizations in meerpipe/binary_tools.py:85-87,111,125.

Centralized here because modular phase arithmetic is easy to get subtly
wrong (SURVEY.md §7.3.3): the double-mod idiom ``((x % n) + n) % n``
yields a value in [0, n) for any sign of x in both Spark and ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def phase_norm(col: Column, modulus=1.0) -> Column:
    """Normalize into [0, modulus) regardless of sign (double-mod idiom)."""
    return ((col % modulus) + modulus) % modulus


def rotate_phase(cube: DataFrame, shift_col: Column, nbin_col: Column, bin_col: str = "bin") -> DataFrame:
    """Circular shift of the phase-bin axis: new_bin = (bin - shift) mod nbin.

    ``shift_col`` may be per-row (per-channel dedispersion) or a scalar
    literal (peak centering). Pure column expression — no shuffle.
    """
    return cube.withColumn(bin_col, phase_norm(F.col(bin_col) - shift_col, nbin_col).cast("long"))


DM_CONST_MHZ = 4.148808e3  # dispersion constant, MHz^2 pc^-1 cm^3 s


def dedisperse_shift(freq_mhz: Column, ref_freq_mhz: Column, dm: Column, period_s: Column, nbin: Column) -> Column:
    """Per-channel phase-bin shift for (de-)dispersion.

    delay(f) = DM_CONST * dm * (f^-2 - fref^-2) seconds;
    shift = round(nbin * delay / period). Applied with rotate_phase.
    """
    delay_s = DM_CONST_MHZ * dm * (F.pow(freq_mhz, -2) - F.pow(ref_freq_mhz, -2))
    return F.round(nbin * delay_s / period_s).cast("long")

"""Polarisation calibration (docs/pipeline_workflow.md:19-22): apply a
per-channel Jones/Mueller correction to the 4-pol coherence products,
and convert coherence → Stokes IQUV.

The reference shells out to ``pac -Q`` (psrchive); here the correction is
a RELATIONAL MATRIX MULTIPLY: the cube's pol axis is 4 rows per
(obs, subint, chan, bin), the calibration matrix is a small broadcast
table (chan, out_pol, in_pol, coef), and

    out[i] = Σ_j coef[i,j] · in[j]

is a broadcast join + groupBy(obs, subint, chan, bin, out_pol) sum —
one shuffle keyed by the cube's natural key, partial-aggregated map-side.
A per-channel complex Jones gain pair (g_a, g_b) compiles to these
Mueller coefficients; arbitrary 4×4 corrections use the same path.

Stokes conversion (make_stokes_movie.py:15-16,50-52 semantics) is the
constant matrix I=AA+BB, Q=AA−BB, U=2Re(AB), V=2Im(AB) — a chan-free
special case of the same operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

CUBE_KEY = ("obs_id", "subint", "chan", "bin")

# Coherence products in pol index order: AA, BB, Re(AB), Im(AB)
STOKES_FROM_COHERENCE = [
    # out_pol (I,Q,U,V = 0..3), in_pol, coef
    (0, 0, 1.0), (0, 1, 1.0),
    (1, 0, 1.0), (1, 1, -1.0),
    (2, 2, 2.0),
    (3, 3, 2.0),
]


def mueller_from_jones_gains(
    spark: SparkSession, gains: list[tuple[int, float, float]]
) -> DataFrame:
    """Diagonal Jones (per-channel real gains g_a, g_b) → Mueller table.

    Coherences transform as AA' = g_a²·AA, BB' = g_b²·BB,
    Re/Im(AB)' = g_a·g_b·Re/Im(AB). ``gains`` rows are (chan, g_a, g_b).
    """
    rows = []
    for chan, ga, gb in gains:
        rows += [
            (chan, 0, 0, ga * ga),
            (chan, 1, 1, gb * gb),
            (chan, 2, 2, ga * gb),
            (chan, 3, 3, ga * gb),
        ]
    return spark.createDataFrame(rows, ["chan", "out_pol", "in_pol", "coef"])


def apply_mueller(cube: DataFrame, matrix: DataFrame, per_channel: bool = True) -> DataFrame:
    """out[i] = Σ_j M[i,j]·in[j] as broadcast-join + regroup.

    ``matrix`` columns: (chan?, out_pol, in_pol, coef); omit ``chan`` (and
    pass per_channel=False) for a constant matrix like Stokes conversion.
    Missing (i, j) entries are implicit zeros.
    """
    join_keys = ["chan", "in_pol"] if per_channel else ["in_pol"]
    tagged = cube.withColumnRenamed("pol", "in_pol")
    joined = tagged.join(F.broadcast(matrix), join_keys)
    keep = [c for c in cube.columns if c not in ("pol", "value", "weight")]
    return (
        joined.groupBy(*keep, F.col("out_pol").alias("pol"))
        .agg(
            F.sum(F.col("coef") * F.col("value")).alias("value"),
            F.min("weight").alias("weight"),
        )
    )


def coherence_to_stokes(cube: DataFrame) -> DataFrame:
    """AA,BB,Re(AB),Im(AB) → I,Q,U,V via the constant Mueller matrix."""
    spark = SparkSession.getActiveSession()
    m = spark.createDataFrame(STOKES_FROM_COHERENCE, ["out_pol", "in_pol", "coef"])
    return apply_mueller(cube, m, per_channel=False)


def needs_jones_calibration(band: F.Column, utc: F.Column) -> F.Column:
    """Date-dependent polarisation-calibration rule
    (docs/pipeline_workflow.md:19-22): UHF observations before
    ~2021-08-18 and L-band before ~2020-04-10 require the full Jones
    matrix (``pac -Q``); later observations only need header updates
    (``pac -XP``)."""
    return (
        ((band == "UHF") & (utc < F.lit("2021-08-18").cast("timestamp")))
        | ((band == "LBAND") & (utc < F.lit("2020-04-10").cast("timestamp")))
    )


C_M_PER_S = 299792458.0


def faraday_rotate(
    cube: DataFrame,
    rm: F.Column,
    freq_col: str = "freq",
    ref_freq_mhz: F.Column | None = None,
) -> DataFrame:
    """Faraday-rotation (RM) correction (docs/pipeline_workflow.md:24):
    de-rotate the linear polarisation plane per channel.

    The ionosphere/ISM rotates the (Q, U) Stokes pair by
    θ(λ) = RM·(λ² − λ_ref²); the correction applies the inverse rotation:

        Q' =  Q·cos2θ + U·sin2θ
        U' = −Q·sin2θ + U·cos2θ

    Column expressions over the Stokes-layout cube (pol 1=Q, 2=U; I and V
    untouched). Pairing Q with U requires co-locating the 4 pol rows of a
    cell: one window keyed by the cube's natural key — the same
    partitioning every other per-cell operator uses, so under a
    pre-partitioned cube table Catalyst reuses the exchange. No UDF.
    λ from the channel centre frequency (MHz).
    """
    lam2 = F.pow(C_M_PER_S / (F.col(freq_col) * 1e6), 2)
    ref2 = (
        F.pow(C_M_PER_S / (ref_freq_mhz * 1e6), 2)
        if ref_freq_mhz is not None
        else F.lit(0.0)
    )
    theta2 = 2.0 * rm * (lam2 - ref2)
    w = Window.partitionBy("obs_id", "subint", "chan", "bin")
    q = F.max(F.when(F.col("pol") == 1, F.col("value"))).over(w)
    u = F.max(F.when(F.col("pol") == 2, F.col("value"))).over(w)
    new_val = (
        F.when(F.col("pol") == 1, q * F.cos(theta2) + u * F.sin(theta2))
        .when(F.col("pol") == 2, -q * F.sin(theta2) + u * F.cos(theta2))
        .otherwise(F.col("value"))
    )
    return cube.withColumn("value", new_val)


def mueller_from_complex_jones(
    spark: SparkSession, jones: list[tuple[int, complex, complex, complex, complex]]
) -> DataFrame:
    """Full 2×2 complex Jones → 4×4 real Mueller coefficients on the
    coherence basis (AA, BB, ReAB, ImAB).

    For J = [[j00, j01], [j10, j11]], the corrected coherency matrix is
    C' = J C J†; expanding C = [[AA, ReAB + i·ImAB], [ReAB − i·ImAB, BB]]
    gives each output component as a real linear combination of the four
    inputs — computed here numerically per channel by applying J to the
    four basis coherency matrices. ``jones`` rows: (chan, j00, j01, j10,
    j11). Feeds apply_mueller unchanged.
    """
    import numpy as np

    # basis coherency matrices for (AA, BB, ReAB, ImAB) = e_k
    basis = [
        np.array([[1, 0], [0, 0]], dtype=complex),
        np.array([[0, 0], [0, 1]], dtype=complex),
        np.array([[0, 1], [1, 0]], dtype=complex),
        np.array([[0, 1j], [-1j, 0]], dtype=complex),
    ]
    rows = []
    for chan, j00, j01, j10, j11 in jones:
        J = np.array([[j00, j01], [j10, j11]], dtype=complex)
        for in_pol, B in enumerate(basis):
            Cp = J @ B @ J.conj().T
            comps = [
                Cp[0, 0].real,          # AA'
                Cp[1, 1].real,          # BB'
                Cp[0, 1].real,          # ReAB'
                Cp[0, 1].imag,          # ImAB'
            ]
            for out_pol, coef in enumerate(comps):
                if abs(coef) > 1e-15:
                    rows.append((chan, out_pol, in_pol, float(coef)))
    return spark.createDataFrame(rows, ["chan", "out_pol", "in_pol", "coef"])

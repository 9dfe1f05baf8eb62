"""psrflux-format dynamic-spectrum source (D4/S7).

Reference: np.loadtxt over whitespace-delimited text with ``#`` comments
(meerpipe/archive_utils.py:116-135); columns
(subint, chan, time_s, freq_mhz, flux, flux_err) — flux==0 AND
flux_err==0 marks a zapped cell (F3, :127).

Spark-first: read.text + regexp split (psrflux pads with variable
whitespace, so csv's single-char delimiter doesn't apply); pushed-down
filter drops comments before the split projects columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

DYNSPEC_COLS = ("subint", "chan", "time_s", "freq_mhz", "flux", "flux_err")


def read_dynspec(spark: SparkSession, path: str, obs_id: str | None = None) -> DataFrame:
    lines = spark.read.text(path)
    toks = F.split(F.trim(F.col("value")), r"\s+")
    df = (
        lines.filter(F.length(F.trim("value")) > 0)
        .filter(~F.trim(F.col("value")).startswith("#"))
        .select(
            toks[0].cast("int").alias("subint"),
            toks[1].cast("int").alias("chan"),
            toks[2].cast("double").alias("time_s"),
            toks[3].cast("double").alias("freq_mhz"),
            toks[4].cast("double").alias("flux"),
            toks[5].cast("double").alias("flux_err"),
        )
    )
    if obs_id is not None:
        df = df.select(F.lit(obs_id).alias("obs_id"), "*")
    return df


def zap_fraction(dynspec: DataFrame, group_cols: tuple[str, ...] = ()) -> DataFrame:
    """A2: fraction of cells with flux==0 AND flux_err==0 (exact zap
    predicate, archive_utils.py:127)."""
    zapped = F.when((F.col("flux") == 0) & (F.col("flux_err") == 0), 1.0).otherwise(0.0)
    agg = F.avg(zapped).alias("zap_fraction")
    return dynspec.groupBy(*group_cols).agg(agg) if group_cols else dynspec.agg(agg)

"""psrcat catalogue source (S14) — the ATNF pulsar-catalogue DB format.

Reference: meerpipe/scripts/fluxcal_meerkat.py:61-88 shells out to the
``psrcat`` binary for two derived quantities — ``psrcat -c "GL GB"``
(get_glgb) and ``psrcat -c "rajd decjd"`` (get_radec) — used as the LAST
tier of the coordinate-resolution precedence chain when the par file has
neither RAJ/DECJ nor ELONG/ELAT (fluxcal_meerkat.py:104-142 via
get_radec_new).

The public psrcat DB format (``psrcat.db``) is a sequence of records
separated by ``@-----`` lines; each record is ``PARAM  VALUE [err]
[ref]`` rows, ``#`` comments allowed:

    PSRJ     J0437-4715
    RAJ      04:37:15.8961737    0.06
    DECJ     -47:15:09.110714    0.07
    DM       2.64476
    @-----------------------------------------------------------------

Spark-first: ``spark.read.option("lineSep", "@")`` splits the file into
one row PER RECORD at the separator (record-parallel across executors —
the full catalogue is ~3500 records but the same reader handles a
billion-row union of catalogue snapshots), then every field extraction
is a higher-order array expression (split → filter → get) running
JVM-side inside whole-stage codegen. The derived quantities psrcat
itself computes — rajd/decjd from sexagesimal or ecliptic coordinates,
gl/gb from the IAU galactic rotation — are pure column expressions from
functions/astro.py. No UDF anywhere.

The catalogue is a few-MB dim table: every use is a BROADCAST join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from meerpipe_spark.functions.astro import (
    equatorial_to_galactic,
    radec_from_par_columns,
)

#: Params extracted as raw strings from each record.
_STRING_PARAMS = ("PSRJ", "PSRB", "RAJ", "DECJ")
#: Params cast to double.
_DOUBLE_PARAMS = ("ELONG", "ELAT", "DM", "F0", "P0")


def _param(lines: Column, name: str) -> Column:
    """Value token of the first record line starting with ``name`` —
    anchored + trailing whitespace so RAJ never matches RAJD."""
    matched = F.filter(lines, lambda l: l.rlike(rf"^{name}\s"))
    first = F.get(matched, 0)
    toks = F.split(F.trim(F.regexp_replace(first, r"\s+", " ")), " ")
    return F.get(toks, 1)


def parse_psrcat_records(records: DataFrame, value_col: str = "value") -> DataFrame:
    """Raw one-row-per-record text → typed catalogue table.

    Output columns: ``psr`` (PSRJ, falling back to PSRB — psrcat's name
    resolution accepts either), the raw params, and the derived
    ``rajd``/``decjd`` (degrees; sexagesimal parse or ecliptic rotation,
    same precedence as psrcat) and ``gl``/``gb`` (IAU galactic frame).
    Records with no name (file header / trailing separator) are dropped.
    """
    lines = F.split(F.col(value_col), "\n")
    # drop comment lines once so param extraction never sees them
    lines = F.filter(lines, lambda l: ~F.trim(l).startswith("#"))
    cols = [
        _param(lines, p).alias(p.lower()) for p in _STRING_PARAMS
    ] + [
        _param(lines, p).cast("double").alias(p.lower()) for p in _DOUBLE_PARAMS
    ]
    raw = records.select(*cols)
    named = raw.withColumn("psr", F.coalesce("psrj", "psrb")).filter(
        F.col("psr").isNotNull()
    )
    rajd, decjd = radec_from_par_columns(
        F.col("raj"), F.col("decj"), F.col("elong"), F.col("elat")
    )
    typed = named.withColumn("rajd", rajd).withColumn("decjd", decjd)
    gl, gb = equatorial_to_galactic(F.col("rajd"), F.col("decjd"))
    return typed.withColumn("gl", gl).withColumn("gb", gb).select(
        "psr", "psrj", "psrb", "raj", "decj", "elong", "elat",
        "dm", "f0", "p0", "rajd", "decjd", "gl", "gb",
    )


def psrcat_scan(spark: SparkSession, path: str) -> DataFrame:
    """Read a psrcat DB file into the typed catalogue table.

    ``lineSep='@'`` makes each ``@-----`` separator start a new row, so
    the scan is record-parallel; the leading dashes of each record's
    first line are comment-stripped by the parser (they start no param).
    """
    records = spark.read.option("lineSep", "@").text(path)
    # strip the separator dashes that lead every record after the first
    cleaned = records.select(
        F.regexp_replace("value", r"^-+\n?", "").alias("value")
    )
    return parse_psrcat_records(cleaned)


def resolve_radec(
    obs: DataFrame,
    catalogue: DataFrame,
    psr_col: str = "psr",
    raj_col: str = "raj",
    decj_col: str = "decj",
    elong_col: str = "elong",
    elat_col: str = "elat",
) -> DataFrame:
    """The reference's full coordinate precedence chain
    (fluxcal_meerkat.py:104-142 then 74-88): per observation,

    1. par-file RAJ/DECJ (sexagesimal) when present,
    2. else par-file ELONG/ELAT via the ecliptic rotation,
    3. else the psrcat catalogue's rajd/decjd, by pulsar name.

    Adds ``rajd``/``decjd`` columns. The catalogue side is explicitly
    broadcast (a dim of ~3500 rows); the obs side never shuffles.
    """
    par_ra, par_dec = radec_from_par_columns(
        F.col(raj_col), F.col(decj_col), F.col(elong_col), F.col(elat_col)
    )
    cat = catalogue.select(
        F.col("psr").alias("_cat_psr"),
        F.col("rajd").alias("_cat_rajd"),
        F.col("decjd").alias("_cat_decjd"),
    )
    joined = obs.join(
        F.broadcast(cat), obs[psr_col] == cat["_cat_psr"], "left"
    )
    return (
        joined.withColumn("rajd", F.coalesce(par_ra, F.col("_cat_rajd")))
        .withColumn("decjd", F.coalesce(par_dec, F.col("_cat_decjd")))
        .drop("_cat_psr", "_cat_rajd", "_cat_decjd")
    )

"""Ephemeris (.par) file source — typed key/value scan.

Reference contract (meerpipe/binary_tools.py:25-74, SURVEY.md S6/D3):
- skip blank lines, ``#`` comments, ``C ``-prefixed comments, and a
  18-entry ignore list (exact token match);
- rename bare ``E`` to ``ECC``;
- 3rd column is an error unless it is the fit flag ``0``/``1``; with 4
  columns the 4th is the error; ``D`` exponents normalize to ``E``;
- value typing: int → 'd'; decimal-parsable → 'e' (had an exponent) or
  'f'; otherwise string → 's'.

Spark-first: ``spark.read.text`` + column expressions (split, regexp,
try_cast cascade) — fully distributed, no Python loop; one small
DataFrame per par file, usually broadcast into downstream joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

IGNORE_PARAMS = (
    "DMMODEL", "DMOFF", "DM_", "CM_", "CONSTRAIN", "JUMP", "NITS",
    "NTOA", "CORRECT_TROPOSPHERE", "PLANET_SHAPIRO", "DILATEFREQ",
    "TIMEEPH", "MODE", "TZRMJD", "TZRSITE", "TZRFRQ", "EPHVER",
    "T2CMETHOD",
)


def read_par_df(spark: SparkSession, path: str) -> DataFrame:
    """Parse par file(s) into (param, value_str, value_num, value_int,
    err, ptype) rows. ``path`` may be a glob; add ``input_file_name()``
    upstream if per-pulsar provenance is needed."""
    lines = spark.read.text(path)
    toks = F.split(F.trim(F.col("value")), r"\s+")
    parsed = (
        lines.filter(F.length(F.trim("value")) > 0)
        .filter(~F.col("value").startswith("#"))
        .filter(~F.col("value").startswith("C "))
        .select(toks.alias("t"))
        .filter(~F.col("t")[0].isin(*IGNORE_PARAMS))
        .select(
            F.when(F.col("t")[0] == "E", "ECC").otherwise(F.col("t")[0]).alias("param"),
            F.get("t", 1).alias("raw_val"),
            F.size("t").alias("n"),
            F.get("t", 2).alias("c3"),
            F.get("t", 3).alias("c4"),
        )
    )
    norm_val = F.regexp_replace("raw_val", "D", "E")
    value_int = F.when(
        F.col("raw_val").rlike(r"^[+-]?\d+$"), F.col("raw_val").try_cast("long")
    )
    value_num = norm_val.try_cast("double")
    err_raw = F.when(
        (F.col("n") == 3) & ~F.col("c3").isin("0", "1"), F.col("c3")
    ).when(F.col("n") == 4, F.col("c4"))
    ptype = (
        F.when(value_int.isNotNull(), "d")
        .when(value_num.isNotNull() & norm_val.rlike("[eE]"), "e")
        .when(value_num.isNotNull(), "f")
        .otherwise("s")
    )
    return parsed.select(
        "param",
        F.col("raw_val").alias("value_str"),
        value_num.alias("value_num"),
        value_int.alias("value_int"),
        F.regexp_replace(err_raw, "D", "E").try_cast("double").alias("err"),
        ptype.alias("ptype"),
    )


def par_to_map(par_df: DataFrame) -> dict:
    """Collect a (small) par DataFrame to the reference's dict shape:
    {param: typed value, param_ERR: float, param_TYPE: char}."""
    out: dict = {}
    for r in par_df.collect():
        if r.ptype == "d":
            out[r.param] = int(r.value_int)
        elif r.ptype in ("e", "f"):
            out[r.param] = float(r.value_num)
        else:
            out[r.param] = r.value_str
        if r.err is not None:
            out[r.param + "_ERR"] = float(r.err)
        out[r.param + "_TYPE"] = r.ptype
    return out

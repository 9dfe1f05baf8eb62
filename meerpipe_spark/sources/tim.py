"""tempo2 ``.tim`` TOA-file source (SURVEY.md §7.1 M6, D5).

The pipeline's TOA outputs (``pat -f tempo2`` in the reference ecosystem)
are FORMAT 1 tim files — a public, stable text format:

    FORMAT 1
    C optional comment
    name freq_mhz toa_mjd err_us site [-flag value ...]

Spark-first: ``spark.read.text`` + pure column expressions (split /
slice / map_from_arrays) — no Python in the parse path, so a directory
of millions of TOAs parses as a distributed columnar scan.

Precision: TOA MJDs carry ~15 fractional digits — more than a double
holds. The MJD string splits into ``imjd`` (long) + ``fmjd`` (double of
the fractional part only, exact to ~1e-16 day ≈ 10 ns), the standard
split used by TOA software; ``mjd`` (lossy double) is also provided for
coarse work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_tim_df(spark: SparkSession, path: str) -> DataFrame:
    """Parse FORMAT 1 tim file(s) (``path`` may be a glob/directory).

    Returns (name, freq_mhz, imjd, fmjd, mjd, err_us, site,
    flags map<string,string>, src_file).
    """
    lines = spark.read.text(path).select(
        F.input_file_name().alias("src_file"), F.trim("value").alias("line")
    )
    toas = (
        lines.filter(F.length("line") > 0)
        .filter(~F.col("line").startswith("#"))
        .filter(~F.col("line").rlike(r"^(?:C\s|C$)"))
        .filter(~F.col("line").rlike(r"^(?:FORMAT|MODE|TIME|EFAC|EQUAD|INCLUDE|JUMP|SKIP|NOSKIP)\b"))
        .select("src_file", F.split("line", r"\s+").alias("t"))
        .filter(F.size("t") >= 5)
    )
    mjd_str = F.get("t", 2)
    imjd = F.split(mjd_str, r"\.").getItem(0).cast("long")
    frac = F.coalesce(F.split(mjd_str, r"\.").getItem(1), F.lit("0"))
    fmjd = F.concat(F.lit("0."), frac).cast("double")
    # trailing tokens are -flag value pairs
    rest = F.slice("t", 6, 1000)
    flag_keys = F.filter(rest, lambda x, i: (i % 2 == 0) & x.startswith("-"))
    flag_vals = F.filter(rest, lambda x, i: i % 2 == 1)
    flags = F.when(
        F.size(flag_keys) == F.size(flag_vals),
        F.map_from_arrays(
            F.transform(flag_keys, lambda k: F.regexp_replace(k, "^-", "")), flag_vals
        ),
    )
    return toas.select(
        F.get("t", 0).alias("name"),
        F.get("t", 1).cast("double").alias("freq_mhz"),
        imjd.alias("imjd"),
        fmjd.alias("fmjd"),
        (imjd.cast("double") + fmjd).alias("mjd"),
        F.get("t", 3).cast("double").alias("err_us"),
        F.get("t", 4).alias("site"),
        flags.alias("flags"),
        "src_file",
    )


def write_tim(toas: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Emit FORMAT 1 lines (flags re-serialized in key order)."""
    flag_str = F.when(
        F.col("flags").isNotNull(),
        F.concat_ws(
            " ",
            F.flatten(
                F.transform(
                    F.map_entries("flags"),
                    lambda e: F.array(F.concat(F.lit("-"), e["key"]), e["value"]),
                )
            ),
        ),
    ).otherwise(F.lit(""))
    # format_number rounds half-up: an fmjd within 5e-16 of 1.0 renders
    # as "1.000000000000000" — carry the overflow into imjd instead of
    # emitting a corrupt "<imjd>1.000..." token.
    fmjd_fmt = F.format_number(F.col("fmjd"), 15)
    overflow = fmjd_fmt.startswith("1")
    mjd_txt = F.concat(
        (F.col("imjd") + F.when(overflow, F.lit(1)).otherwise(F.lit(0))).cast("string"),
        F.when(overflow, F.lit(".000000000000000")).otherwise(
            F.regexp_replace(fmjd_fmt, r"^0", "")
        ),
    )
    line = F.concat_ws(
        " ",
        F.col("name"),
        F.col("freq_mhz").cast("string"),
        mjd_txt,
        F.col("err_us").cast("string"),
        F.col("site"),
        flag_str,
    )
    header = toas.sparkSession.createDataFrame([("FORMAT 1",)], ["value"])
    body = toas.select(F.trim(line).alias("value"))
    header.unionByName(body).coalesce(1).write.mode(mode).text(path)

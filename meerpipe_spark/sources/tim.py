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
    """Emit one FORMAT 1 file (flags re-serialized in key order).
    Single-file by design — the small-export / fingerprint-lane shape;
    bulk exports use :func:`write_tim_sharded` (N parallel writers +
    INCLUDE manifest) instead of funneling the corpus through one
    task. format_number rounds half-up: an fmjd within 5e-16 of 1.0
    renders as "1.000000000000000" — _format1_lines carries that
    overflow into imjd instead of emitting a corrupt token."""
    header = toas.sparkSession.createDataFrame([("FORMAT 1",)], ["value"])
    body = toas.select(_format1_lines(toas).alias("value"))
    header.unionByName(body).coalesce(1).write.mode(mode).text(path)


def _format1_lines(toas: DataFrame) -> F.Column:
    """FORMAT 1 line text for a TOA row (flags re-serialized in key
    order; fmjd rendered to 15 digits with half-up overflow carried
    into imjd — see write_tim)."""
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
    fmjd_fmt = F.format_number(F.col("fmjd"), 15)
    overflow = fmjd_fmt.startswith("1")
    mjd_txt = F.concat(
        (F.col("imjd") + F.when(overflow, F.lit(1)).otherwise(F.lit(0))).cast("string"),
        F.when(overflow, F.lit(".000000000000000")).otherwise(
            F.regexp_replace(fmjd_fmt, r"^0", "")
        ),
    )
    return F.trim(
        F.concat_ws(
            " ",
            F.col("name"),
            F.col("freq_mhz").cast("string"),
            mjd_txt,
            F.col("err_us").cast("string"),
            F.col("site"),
            flag_str,
        )
    )


def write_tim_sharded(
    toas: DataFrame, path: str, n_shards: int = 16, mode: str = "overwrite"
) -> str:
    """BULK .tim sink: per-partition FORMAT 1 shards + a deterministic
    INCLUDE manifest — the scale path write_tim's coalesce(1) is not
    (VERDICT r9 item 7: the single-file sink serializes the whole
    corpus through one task; fine for a fingerprint lane, wrong for a
    bulk TOA export).

    Layout (every piece is valid tempo2 input):

        path/shard=<i>/part-*.txt   FORMAT 1 + that shard's TOAs
        path/manifest.tim           FORMAT 1 + INCLUDE lines, shards in
                                    ascending id / sorted-name order

    Shard assignment is CONTENT-deterministic (xxhash64 of the rendered
    line, mod n_shards): re-running the sink on the same TOAs produces
    the same shard membership regardless of input partitioning. Each
    shard's rows sort by (imjd, fmjd, line) with its header first —
    sortWithinPartitions after an n_shards hash repartition, so exactly
    one task writes each shard (N parallel writers, no global sort, no
    driver data path). The manifest is metadata-sized and written
    driver-side after the job commits (the ledger discipline: data
    parallel, commit marker tiny and last).

    Returns the manifest path. read_tim_df(path + "/shard=*") parses
    the shards back as one distributed scan (FORMAT/INCLUDE lines are
    directive-filtered by the reader).
    """
    import os

    line = _format1_lines(toas)
    body = toas.select(
        F.pmod(F.xxhash64(line), F.lit(n_shards)).cast("int").alias("shard"),
        F.lit(1).alias("_hdr"),
        F.col("imjd").alias("_k1"),
        F.col("fmjd").alias("_k2"),
        line.alias("value"),
    )
    header = (
        toas.sparkSession.range(n_shards)
        .select(
            F.col("id").cast("int").alias("shard"),
            F.lit(0).alias("_hdr"),
            F.lit(-1).cast("long").alias("_k1"),
            F.lit(0.0).alias("_k2"),
            F.lit("FORMAT 1").alias("value"),
        )
    )
    (
        header.unionByName(body)
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "_hdr", "_k1", "_k2", "value")
        .select("shard", "value")
        .write.mode(mode)
        .partitionBy("shard")
        .text(path)
    )
    manifest = os.path.join(path, "manifest.tim")
    lines = ["FORMAT 1"]
    for d in sorted(
        (n for n in os.listdir(path) if n.startswith("shard=")),
        key=lambda n: int(n.split("=", 1)[1]),
    ):
        for part in sorted(os.listdir(os.path.join(path, d))):
            if not part.startswith(("_", ".")) and not part.endswith(".crc"):
                lines.append(f"INCLUDE {d}/{part}")
    tmp = manifest + ".tmp"
    with open(tmp, "w") as f:
        f.write("\n".join(lines) + "\n")
    os.replace(tmp, manifest)
    return manifest

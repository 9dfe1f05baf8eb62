"""Catalogue sources (S8/D6): RM catalogue, Tsky tables — whitespace
text with ``#`` comments — plus the reference's data-integrity checks.

Reference: meerpipe/data/rm_catalogue.txt loaded at data_load.py:18;
QA contract in tests/test_data.py:3-34 — no duplicate pulsars, no
malformed leading-zero values. These catalogues are broadcast dims in
every join (J2/J4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_catalogue(
    spark: SparkSession,
    path: str,
    columns: tuple[str, ...] = ("psr", "rm"),
    numeric_cols: tuple[str, ...] = ("rm",),
    passthrough_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Whitespace-delimited catalogue with ``#`` comments → typed rows.

    ``passthrough_cols`` keeps non-token columns that file-source
    partition discovery attaches (e.g. ``obs=<id>/`` directories of
    per-observation header files scanned as ONE distributed read with
    provenance from the path — the cluster-scale shape of the
    reference's per-file ``get_listinfo`` loop,
    scripts/fluxcal_meerkat.py:19-31).
    """
    toks = F.split(F.trim(F.col("value")), r"\s+")
    df = (
        spark.read.text(path)
        .filter(F.length(F.trim("value")) > 0)
        .filter(~F.trim(F.col("value")).startswith("#"))
        .select(
            *[F.get(toks, i).alias(c) for i, c in enumerate(columns)],
            *[F.col(c) for c in passthrough_cols],
        )
    )
    for c in numeric_cols:
        df = df.withColumn(c, F.col(c).try_cast("double"))
    return df


def catalogue_qa(cat: DataFrame, key_col: str = "psr", raw_value_col: str | None = None) -> dict:
    """A13 integrity checks (tests/test_data.py:3-34):
    - duplicate keys (must be none);
    - malformed leading-zero numeric strings like '07.5' (must be none).
    Returns {'duplicates': [...], 'malformed': [...]} for assertion/alerting.
    """
    dups = [
        r[0]
        for r in cat.groupBy(key_col)
        .count()
        .filter(F.col("count") > 1)
        .select(key_col)
        .collect()
    ]
    malformed = []
    if raw_value_col is not None:
        malformed = [
            r[0]
            for r in cat.filter(
                F.col(raw_value_col).rlike(r"^-?0\d")  # leading zero before a digit
            )
            .select(key_col)
            .collect()
        ]
    return {"duplicates": dups, "malformed": malformed}

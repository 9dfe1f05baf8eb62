"""Z-order layout tests: Morton key bit correctness and the actual
data-skipping property — per-file min/max spans on BOTH dimensions are
narrow under Z-order clustering, vs full-width on the unsorted dimension
under a linear sort."""

from __future__ import annotations

import glob

from pyspark.sql import Row, functions as F

from meerpipe_spark.io import morton_key, write_zordered


def test_morton_key_bit_exact(spark):
    df = spark.createDataFrame([Row(a=3, b=1), Row(a=0, b=0), Row(a=255, b=0)])
    got = [
        r.z for r in df.select(morton_key(F.col("a"), F.col("b")).alias("z"))
        .orderBy("a").collect()
    ]
    # a bits land on even positions, b bits on odd:
    # (0,0) -> 0; (3,1) -> 0b101 | 0b010 = 7; (255,0) -> 0b0101010101010101
    assert got == [0, 7, 0b0101010101010101]


def _file_spans(spark, path, col):
    spans = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        row = spark.read.parquet(f).agg(
            F.min(col).alias("lo"), F.max(col).alias("hi")
        ).collect()[0]
        spans.append(row.hi - row.lo)
    return spans


def test_zorder_narrows_both_dimensions(spark, tmp_path):
    import random

    rng = random.Random(11)
    rows = [Row(x=rng.randrange(256), y=rng.randrange(256)) for _ in range(20000)]
    df = spark.createDataFrame(rows)

    lin = str(tmp_path / "linear")
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(lin)
    )
    zo = str(tmp_path / "zorder")
    write_zordered(df, zo, morton_key(F.col("x"), F.col("y"), bits=8), num_files=16)

    lin_y = _file_spans(spark, lin, "y")
    z_x = _file_spans(spark, zo, "x")
    z_y = _file_spans(spark, zo, "y")

    # linear sort on x leaves y full-width in every file
    assert min(lin_y) > 200
    # z-order tiles: 16 files over a 16-bit key ~ 64x64 tiles; both
    # dimensions stay far below full width in a typical file
    assert sorted(z_x)[len(z_x) // 2] < 128
    assert sorted(z_y)[len(z_y) // 2] < 128
    # so a range predicate on y prunes most files by parquet min/max
    # stats under z-order and none under the linear layout

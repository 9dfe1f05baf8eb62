"""Round-12 additions: asof hot-key bucket pre-split (VERDICT r11 item
3), ALS reg guard, JPEG ZRL overflow guard (ADVICE r11)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from meerpipe_spark.operators.asof import asof_join


def _skewed_frames(spark, n_left=4000, n_right=300):
    """One hyperactive key ('hot') holding ~90% of rows plus two normal
    keys; numeric ts so bucket boundaries are easy to reason about."""
    left = spark.range(n_left).select(
        F.col("id").alias("lid"),
        F.when(F.col("id") % 10 < 9, "hot")
        .when(F.col("id") % 10 == 9, "k1")
        .otherwise("k2")
        .alias("k"),
        # deterministic scatter, collisions with right ts included
        ((F.col("id") * 37) % 10007).cast("double").alias("ts"),
        (F.col("id") % 97).cast("double").alias("lv"),
    )
    right = spark.range(n_right).select(
        F.col("id").alias("rid"),
        F.when(F.col("id") % 5 < 4, "hot").otherwise("k1").alias("k"),
        ((F.col("id") * 211) % 10007).cast("double").alias("ts"),
        (F.col("id") * 10).cast("double").alias("rv"),
    )
    return left, right


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_bucket_split_equals_unsplit(spark, direction):
    left, right = _skewed_frames(spark)
    kwargs = dict(
        on="k", ts_col="ts", value_cols=["rv"], direction=direction,
        tiebreak_col="rid",
    )
    base = asof_join(left, right, **kwargs)
    split = asof_join(left, right, bucket_width=500.0, **kwargs)
    key = lambda r: r.lid  # noqa: E731
    b = sorted(base.collect(), key=key)
    s = sorted(split.collect(), key=key)
    assert len(b) == left.count()
    assert [tuple(r) for r in b] == [tuple(r) for r in s]


def test_asof_bucket_split_multipartition_plan(spark):
    """The fill window must partition on (key, _bkt) — a hot key then
    spreads over span/bucket_width tasks instead of serializing into
    one window partition."""
    left, right = _skewed_frames(spark, n_left=500, n_right=50)
    split = asof_join(
        left, right, on="k", ts_col="ts", value_cols=["rv"],
        tiebreak_col="rid", bucket_width=1000.0,
    )
    plan = split._jdf.queryExecution().executedPlan().toString()
    assert "_bkt" in plan, "bucketed as-of must window-partition on _bkt"
    # and the bucket column itself never leaks into the result schema
    assert "_bkt" not in split.columns
    # >1 distinct (key, bucket) group for the hot key proves the split
    n_groups = (
        left.select("k", F.floor(F.col("ts") / 1000.0).alias("b"))
        .filter(F.col("k") == "hot").distinct().count()
    )
    assert n_groups > 1


def test_asof_bucket_width_validation(spark):
    left, right = _skewed_frames(spark, n_left=10, n_right=5)
    with pytest.raises(ValueError, match="bucket_width"):
        asof_join(
            left, right, on="k", ts_col="ts", value_cols=["rv"],
            bucket_width=0.0,
        )
    with pytest.raises(ValueError, match="reserves"):
        asof_join(
            left.withColumn("_bkt", F.lit(1)), right, on="k", ts_col="ts",
            value_cols=["rv"],
        )


def test_asof_bucket_split_timestamp_ts(spark):
    """Timestamp ts columns bucket on epoch seconds — same results as
    the unsplit path on the canonical small fixture."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    mk = lambda s: t0 + dt.timedelta(seconds=s)  # noqa: E731
    left = spark.createDataFrame(
        [Row(lid=i, k="a", ts=mk(i * 40), lv=float(i)) for i in range(1, 9)]
    )
    right = spark.createDataFrame(
        [Row(k="a", ts=mk(s), rv=float(s)) for s in (35, 95, 200)]
    )
    base = asof_join(left, right, on="k", ts_col="ts", value_cols=["rv"])
    split = asof_join(
        left, right, on="k", ts_col="ts", value_cols=["rv"],
        bucket_width=60.0,
    )
    assert sorted(map(tuple, base.collect())) == sorted(
        map(tuple, split.collect())
    )


def test_als_rank_k_rejects_nonpositive_reg(spark):
    from meerpipe_spark.operators.als import als_rank_k

    df = spark.createDataFrame(
        [Row(u=1, i=1, r=1.0), Row(u=1, i=2, r=2.0), Row(u=2, i=1, r=3.0)]
    )
    with pytest.raises(ValueError, match="reg > 0"):
        als_rank_k(df, k=2, reg=0.0)
    with pytest.raises(ValueError, match="reg > 0"):
        als_rank_k(df, k=2, reg=-1.0)


def test_jpeg_zrl_overflow_rejected(spark):
    """A scan whose ZRL run pushes the coefficient index past 63 must
    decode_ok=False instead of silently acting like EOB (ADVICE r11):
    hand-build an 8x8 baseline JPEG whose single block is DC + four ZRL
    symbols (index 1 -> 65)."""
    import struct

    import numpy as np

    from meerpipe_spark.operators import multimodal as mm

    dc_codes = mm._canonical_codes(mm._K_DC_BITS, mm._K_DC_VALS)
    ac_codes = mm._canonical_codes(mm._K_AC_BITS, mm._K_AC_VALS)
    w = mm._BitWriter()
    code, ln = dc_codes[0]  # DC diff 0 (size category 0)
    w.write(code, ln)
    for _ in range(4):  # 4 x ZRL: idx 1 -> 17 -> 33 -> 49 -> 65 (>63)
        code, ln = ac_codes[0xF0]
        w.write(code, ln)
    scan = w.done()
    q = np.full(64, 17, dtype=np.uint8)
    q[0] = 8
    app0 = struct.pack(
        ">HH5sBBBHHBB", 0xFFE0, 16, b"JFIF\x00", 1, 2, 0, 72, 72, 0, 0
    )
    dqt = struct.pack(">HHB", 0xFFDB, 67, 0) + q.tobytes()
    sof0 = struct.pack(">HHBHHBBBB", 0xFFC0, 11, 8, 8, 8, 1, 1, 0x11, 0)
    sos = struct.pack(">HHBBBBBB", 0xFFDA, 8, 1, 1, 0, 0, 0x3F, 0)
    payload = (
        b"\xff\xd8" + app0 + dqt + sof0 + mm._dht_segment() + sos + scan
        + b"\xff\xd9"
    )
    media = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, payload binary"
    )
    row = mm.jpeg_decode_pixels(media).collect()[0]
    assert row.decode_ok is False
    assert row.pixel_sum is None


def test_gif_roundtrip_expected_stats(spark):
    """vectors_to_gif → gif_decode_pixels reproduces gif_frame_expect
    exactly for clean ids; both poison classes isolate to one
    decode_ok=False row."""
    from meerpipe_spark.operators.multimodal import (
        gif_decode_pixels,
        gif_frame_expect,
        vectors_to_gif,
    )

    ids = [0, 1, 7, 13, 29, 42, 97 + 13, 97 + 29, 255]
    vecs = spark.createDataFrame([(i,) for i in ids], "vec_id long")
    out = gif_decode_pixels(vectors_to_gif(vecs)).collect()
    by_id: dict[int, list] = {}
    for r in out:
        by_id.setdefault(r.media_id, []).append(r)
    for i in ids:
        rows = by_id[i]
        if i % 97 in (13, 29):
            assert len(rows) == 1 and rows[0].decode_ok is False
            assert rows[0].frame_sum is None
            continue
        assert len(rows) == 3
        for r in sorted(rows, key=lambda r: r.frame_idx):
            exp = gif_frame_expect(i, r.frame_idx)
            assert (
                r.width, r.height, r.frame_sum, r.wsum, r.px00, r.pxc
            ) == (
                exp["width"], exp["height"], exp["frame_sum"],
                exp["wsum"], exp["px00"], exp["pxc"],
            )

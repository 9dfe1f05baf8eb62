"""Round-11 additions: parameterized rank-k ALS / depth-d CART
(VERDICT r10 item 7), plus the ADVICE r10 API-edge guards."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F


def _rank_k_ratings(spark, k: int, n_u: int = 24, n_i: int = 18):
    """Exact rank-k ratings from deterministic integer-formula factors."""
    rows = []
    for u in range(n_u):
        pu = [1.0 + ((u * (f + 2)) % 5) * 0.4 for f in range(k)]
        for i in range(n_i):
            qi = [0.5 + ((i * (f + 3)) % 7) * 0.3 for f in range(k)]
            rows.append(Row(u=u, i=i, r=sum(a * b for a, b in zip(pu, qi))))
    return spark.createDataFrame(rows)


def test_als_rank_k_matches_rank2_at_k2(spark):
    from meerpipe_spark.operators.als import als_rank2, als_rank_k

    rows = [
        Row(u=u, i=i, r=float((u * 7 + i * 3) % 11 + 1))
        for u in range(10)
        for i in range(8)
    ]
    df = spark.createDataFrame(rows)
    u2, _ = als_rank2(df, iters=3, reg=0.5)
    uk, _ = als_rank_k(df, k=2, iters=3, reg=0.5)
    a = {r["u"]: (r["p1"], r["p2"]) for r in u2.collect()}
    b = {r["u"]: tuple(r["p"]) for r in uk.collect()}
    assert set(a) == set(b)
    for u in a:
        # same init, same sufficient stats; Cramer vs LAPACK solve of
        # the same 2x2 systems — identical to float noise
        assert a[u][0] == pytest.approx(b[u][0], abs=1e-9)
        assert a[u][1] == pytest.approx(b[u][1], abs=1e-9)


def test_als_rank_k_recovers_rank4_matrix(spark):
    from meerpipe_spark.operators.als import als_rank_k, als_rmse_k

    ratings = _rank_k_ratings(spark, k=4)
    userf, itemf = als_rank_k(ratings, k=4, iters=6, reg=0.01)
    m = als_rmse_k(ratings, userf, itemf).collect()[0]
    assert m["n_ratings"] == 24 * 18
    assert m["rmse"] < 0.05


def test_als_rank_k_objective_decreases(spark):
    from meerpipe_spark.operators.als import als_rank_k, als_rmse_k

    reg = 0.3
    rows = [
        Row(u=u, i=i, r=float((u * 5 + i * 11) % 13 + 1))
        for u in range(15)
        for i in range(12)
    ]
    df = spark.createDataFrame(rows)
    objs = []
    for iters in (1, 2, 4):
        uf, itf = als_rank_k(df, k=4, iters=iters, reg=reg)
        objs.append(
            als_rmse_k(df, uf, itf, reg=reg).collect()[0]["objective"]
        )
    # each extra alternation provably non-increases the ridge objective
    assert objs[1] <= objs[0] + 1e-6
    assert objs[2] <= objs[1] + 1e-6


def test_als_rank_k_partition_invariant(spark):
    from meerpipe_spark.operators.als import als_rank_k

    rows = [
        Row(u=u, i=i, r=float((u * 7 + i * 3) % 11 + 1))
        for u in range(10)
        for i in range(8)
    ]
    df = spark.createDataFrame(rows)
    a = {r["u"]: tuple(round(x, 8) for x in r["p"])
         for r in als_rank_k(df, k=3, iters=2)[0].collect()}
    b = {r["u"]: tuple(round(x, 8) for x in r["p"])
         for r in als_rank_k(df.repartition(17), k=3, iters=2)[0].collect()}
    assert a == b


def test_als_iter_and_rank_guards(spark):
    from meerpipe_spark.operators.als import als_rank2, als_rank_k

    df = spark.createDataFrame([Row(u=0, i=0, r=1.0)])
    with pytest.raises(ValueError, match="iters >= 1"):
        als_rank2(df, iters=0)
    with pytest.raises(ValueError, match="iters >= 1"):
        als_rank_k(df, k=2, iters=0)
    with pytest.raises(ValueError, match="k >= 1"):
        als_rank_k(df, k=0)


def test_tree_depth3_separates_hierarchical_stripes(spark):
    from meerpipe_spark.operators.tree import binned_split_tree

    # Hierarchical-gain stripes (greedy-separable, unlike alternating
    # parity where midpoint cuts have zero Gini gain): [0,.125)=0,
    # [.125,.25)=1, [.25,.5)=0, [.5,1]=1. Greedy root picks 0.5, the
    # left child 0.25, its left child 0.125 — exactly depth 3, all
    # leaves pure. x0 spans [0,1] inclusive so grid edges k/32 are
    # binary-exact and every stripe boundary lands on a bin edge.
    n = 400
    rows = []
    for i in range(n + 1):
        x = i / float(n)
        y = 1 if x >= 0.5 else (0 if x >= 0.25 else (1 if x >= 0.125 else 0))
        rows.append(Row(x0=x, y=y))
    out = binned_split_tree(
        spark.createDataFrame(rows), ["x0"], "y", depth=3, bins=32
    ).collect()
    leaves = [r for r in out if r["kind"] == "leaf"]
    splits = {r["node"]: r for r in out if r["kind"] == "split"}
    assert sum(l["n"] for l in leaves) == n + 1
    assert all(l["pos"] in (0, l["n"]) for l in leaves)
    assert len(leaves) == 4 and len(splits) == 3
    assert splits[1]["thr"] == pytest.approx(0.5)
    assert splits[2]["thr"] == pytest.approx(0.25)
    assert splits[4]["thr"] == pytest.approx(0.125)
    # node ids form a proper binary tree: every leaf's ancestors split
    for l in leaves:
        node = l["node"]
        while node > 1:
            node //= 2
            assert node in splits


def _tree_train_errors(out_rows) -> int:
    """Misclassified training rows implied by the fitted tree's leaf
    counts (majority leaf prediction)."""
    return sum(
        min(r["pos"], r["n"] - r["pos"])
        for r in out_rows
        if r["kind"] == "leaf"
    )


def test_tree_deeper_never_worse_on_training(spark):
    from meerpipe_spark.operators.tree import binned_split_tree

    # each extra level only ever refines leaves (splits require strict
    # impurity reduction), so training error is monotone in depth
    rows = [
        Row(x0=(i % 25) / 25.0, x1=((i * 17) % 50) / 50.0,
            y=1 if ((i % 25) / 25.0) * 2 + ((i * 17) % 50) / 50.0 > 1.2 else 0)
        for i in range(500)
    ]
    df = spark.createDataFrame(rows)
    errs = [
        _tree_train_errors(
            binned_split_tree(df, ["x0", "x1"], "y", depth=d, bins=16).collect()
        )
        for d in (1, 2, 3)
    ]
    assert errs[1] <= errs[0]
    assert errs[2] <= errs[1]


def test_tree_depth_nested_consistency(spark):
    from meerpipe_spark.operators.tree import binned_split_tree

    # greedy CART: the depth-2 prefix of a depth-3 fit is the depth-2
    # fit (same data, same grid) — deeper fitting never rewrites
    # shallower decisions.
    rows = [
        Row(
            x0=(i % 20) / 20.0,
            x1=((i * 13) % 40) / 40.0,
            y=1 if ((i % 20) / 20.0 + ((i * 13) % 40) / 40.0) > 0.8 else 0,
        )
        for i in range(300)
    ]
    df = spark.createDataFrame(rows)
    d2 = binned_split_tree(df, ["x0", "x1"], "y", depth=2, bins=16).collect()
    d3 = binned_split_tree(df, ["x0", "x1"], "y", depth=3, bins=16).collect()
    s2 = {r["node"]: (r["feature"], r["bin"]) for r in d2 if r["kind"] == "split"}
    s3 = {r["node"]: (r["feature"], r["bin"]) for r in d3 if r["kind"] == "split"}
    for node, choice in s2.items():
        assert s3.get(node) == choice


def test_gini_decimal_matches_double_small_counts(spark):
    # the decimal(38,0) squares (ADVICE r10 overflow fix) must round to
    # exactly the double values the old bigint path produced for any
    # count far below the old overflow cliff
    from meerpipe_spark.operators.tree import _gini_pair

    df = spark.createDataFrame(
        [Row(n=n, pos=p) for n in (1, 2, 7, 10**9) for p in (0, 1, n // 2, n)]
    )
    got = df.select(
        _gini_pair(F.col("n").cast("bigint"), F.col("pos").cast("bigint")).alias("g"),
        (
            F.col("n").cast("double")
            - (
                F.col("pos").cast("double") * F.col("pos")
                + (F.col("n") - F.col("pos")).cast("double")
                * (F.col("n") - F.col("pos"))
            )
            / F.col("n").cast("double")
        ).alias("ref"),
    ).collect()
    for r in got:
        assert r["g"] == pytest.approx(r["ref"], rel=1e-12)


def test_gini_decimal_survives_3e9_counts(spark):
    # the exact scenario ADVICE flagged: a node side beyond ~3.0e9
    # same-class rows overflowed bigint pos^2 under ANSI; decimal(38,0)
    # must return the exact-rounded double instead of throwing
    from meerpipe_spark.operators.tree import _gini_pair

    n, pos = 6_000_000_000, 4_000_000_000
    df = spark.createDataFrame([Row(n=n, pos=pos)])
    g = df.select(
        _gini_pair(F.col("n").cast("bigint"), F.col("pos").cast("bigint")).alias("g")
    ).collect()[0]["g"]
    neg = n - pos
    assert g == pytest.approx(n - (pos * pos + neg * neg) / n, rel=1e-12)


# ---------------------------------------------------------------------------
# Coded-JPEG entropy decode (VERDICT r10 item 4)
# ---------------------------------------------------------------------------


def _jpeg_payload(coefs_per_block, q_overrides=None, width=16, height=16):
    """Hand-build a baseline grayscale JPEG from quantized-coefficient
    dicts (zigzag index -> value), independent of the production
    encoder's coefficient placement — exercises ZRL, long runs, and
    non-rational positions."""
    import struct

    from meerpipe_spark.operators import multimodal as mm

    dc_codes = mm._canonical_codes(mm._K_DC_BITS, mm._K_DC_VALS)
    ac_codes = mm._canonical_codes(mm._K_AC_BITS, mm._K_AC_VALS)
    q = [17] * 64
    for k, v in (q_overrides or {}).items():
        q[k] = v
    w = mm._BitWriter()
    prev = 0
    for coefs in coefs_per_block:
        dc = coefs.get(0, 0)
        diff = dc - prev
        prev = dc
        s = mm._size_cat(diff)
        code, ln = dc_codes[s]
        w.write(code, ln)
        if s:
            w.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        last = 0
        for idx in sorted(k for k in coefs if k > 0):
            v = coefs[idx]
            if v == 0:
                continue
            run = idx - last - 1
            while run >= 16:
                code, ln = ac_codes[0xF0]
                w.write(code, ln)
                run -= 16
            s = mm._size_cat(v)
            code, ln = ac_codes[(run << 4) | s]
            w.write(code, ln)
            w.write(v if v >= 0 else v + (1 << s) - 1, s)
            last = idx
        if last != 63:
            code, ln = ac_codes[0x00]
            w.write(code, ln)
    scan = w.done()
    app0 = struct.pack(
        ">HH5sBBBHHBB", 0xFFE0, 16, b"JFIF\x00", 1, 2, 0, 72, 72, 0, 0
    )
    dqt = struct.pack(">HHB", 0xFFDB, 67, 0) + bytes(q)
    sof0 = struct.pack(
        ">HHBHHBBBB", 0xFFC0, 11, 8, height, width, 1, 1, 0x11, 0
    )
    sos = struct.pack(">HHBBBBBB", 0xFFDA, 8, 1, 1, 0, 0, 0x3F, 0)
    return (
        b"\xff\xd8" + app0 + dqt + sof0 + mm._dht_segment() + sos + scan
        + b"\xff\xd9"
    )


def _decode_one(spark, payload):
    from meerpipe_spark.operators.multimodal import jpeg_decode_pixels

    df = spark.createDataFrame([(0, bytearray(payload))], "media_id long, payload binary")
    return jpeg_decode_pixels(df).collect()[0]


def test_jpeg_coded_roundtrip_matches_formula(spark):
    from meerpipe_spark.operators.multimodal import (
        jpeg_coded_expect,
        jpeg_decode_pixels,
        vectors_to_jpeg_coded,
    )

    ids = [0, 1, 5, 42, 96, 98, 1234]
    df = spark.createDataFrame([(i,) for i in ids], "vec_id long")
    out = {r["media_id"]: r for r in
           jpeg_decode_pixels(vectors_to_jpeg_coded(df)).collect()}
    for i in ids:
        e = jpeg_coded_expect(i)
        r = out[i]
        assert r["decode_ok"]
        for k in ("width", "height", "pixel_sum", "px_b0", "px_b1",
                  "px_b2", "px_b3"):
            assert r[k] == e[k], (i, k)


def test_jpeg_coded_poison_isolation(spark):
    from meerpipe_spark.operators.multimodal import (
        jpeg_decode_pixels,
        vectors_to_jpeg_coded,
    )

    ids = [13, 29, 13 + 97, 29 + 97, 30]
    df = spark.createDataFrame([(i,) for i in ids], "vec_id long")
    out = {r["media_id"]: r for r in
           jpeg_decode_pixels(vectors_to_jpeg_coded(df)).collect()}
    for i in (13, 29, 110, 126):
        assert out[i]["decode_ok"] is False
        assert out[i]["pixel_sum"] is None
    assert out[30]["decode_ok"] is True


def test_jpeg_decode_zrl_long_run(spark):
    # one coefficient at zigzag index 20: run of 19 zeros needs a ZRL
    # (15,0) symbol plus a (3,size) code — the path the production
    # payloads never hit. (0-indexed zigzag 20 = (row,col)=(4,1)... the
    # exact position doesn't matter; the SUM over the block of any pure
    # AC basis is 0, so pixel_sum must equal the DC-only value.)
    dc, ac = 4, 3
    payload = _jpeg_payload(
        [{0: dc, 20: ac}, {0: dc}, {0: dc}, {0: dc}],
        q_overrides={0: 16, 20: 16},
    )
    r = _decode_one(spark, payload)
    assert r["decode_ok"]
    # per block: 64 * 128 + 8 * dc_deq
    assert r["pixel_sum"] == 4 * (64 * 128 + 8 * dc * 16)


def test_jpeg_decode_general_position_matches_reference_idct(spark):
    # coefficient at a NON-rational position (zigzag 1) — decoded block
    # must match an independently computed double-precision IDCT,
    # with every pixel provably off the .5 rounding boundary
    import math

    import numpy as np

    from meerpipe_spark.operators import multimodal as mm

    dc, ac, q0, q1 = 5, 7, 16, 12
    payload = _jpeg_payload(
        [{0: dc, 1: ac}, {0: dc}, {0: dc}, {0: dc}],
        q_overrides={0: q0, 1: q1},
    )
    coef = np.zeros((8, 8))
    r0, c0 = mm._ZZ[0]
    coef[r0, c0] = dc * q0
    r1, c1 = mm._ZZ[1]
    coef[r1, c1] = ac * q1
    ref = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = math.sqrt(0.5) if u == 0 else 1.0
                    cv = math.sqrt(0.5) if v == 0 else 1.0
                    s += (
                        cu * cv * coef[u, v] / 4.0
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            ref[x, y] = s
    # guard: no pixel near the round-half boundary (so float-op order
    # differences between reference and decoder cannot flip a pixel)
    assert (np.abs(ref - np.round(ref)) < 0.49).all()
    expect = np.clip(np.rint(ref) + 128, 0, 255).astype(int)
    r = _decode_one(spark, payload)
    assert r["decode_ok"]
    assert r["px_b0"] == expect[0, 0]
    assert r["pixel_sum"] == int(expect.sum()) + 3 * (64 * 128 + 8 * dc * q0)


def test_jpeg_decode_rejects_trailing_entropy_garbage(spark):
    base = _jpeg_payload([{0: 1}, {0: 1}, {0: 1}, {0: 1}])
    # splice extra entropy bytes between the scan and EOI
    poisoned = base[:-2] + b"\x55\x55" + base[-2:]
    r = _decode_one(spark, poisoned)
    assert r["decode_ok"] is False

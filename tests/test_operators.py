"""Operator-level unit tests on synthetic cube data, validated against
straight numpy/python implementations of the reference semantics
(SURVEY.md §5 test strategy)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import Row, functions as F

from meerpipe_spark.operators.chop import chop_edge_channels, get_band
from meerpipe_spark.operators.phase import phase_norm, rotate_phase
from meerpipe_spark.operators.scrunch import scrunch, template_adjust_factor
from meerpipe_spark.operators.snr import cumulative_snr
from meerpipe_spark.operators.toa import calc_max_nsub


@pytest.fixture(scope="module")
def cube(spark):
    """1 obs × 4 subints × 2 pol × 8 chans × 16 bins, seeded values."""
    rng = np.random.default_rng(42)
    rows = []
    for s in range(4):
        for p in range(2):
            for c in range(8):
                for b in range(16):
                    rows.append(
                        Row(
                            obs_id="obs1",
                            subint=s,
                            pol=p,
                            chan=c,
                            bin=b,
                            freq=856.0 + c * 107.0,
                            value=float(rng.normal()),
                            weight=0.0 if c == 3 else 1.0,
                        )
                    )
    return spark.createDataFrame(rows).cache()


def test_scrunch_time_freq_weighted(spark, cube):
    out = scrunch(cube, t_factor=2, f_factor=4).collect()
    pdf = cube.toPandas()
    for r in out:
        sel = pdf[
            (pdf.subint // 2 == r.subint)
            & (pdf.pol == r.pol)
            & (pdf.chan // 4 == r.chan)
            & (pdf["bin"] == r.bin)
        ]
        wsum = sel.weight.sum()
        expect = (sel.value * sel.weight).sum() / wsum if wsum != 0 else None
        if expect is None:
            assert r.value is None
        else:
            assert abs(r.value - expect) < 1e-12
        assert abs(r.weight - wsum) < 1e-12


def test_pscrunch_keeps_first_two_pols(spark, cube):
    out = scrunch(cube, pscrunch=True)
    assert out.select("pol").distinct().collect() == [Row(pol=0)]
    n_groups = out.count()
    assert n_groups == 4 * 8 * 16  # subint × chan × bin
    # pam -S total intensity: I = AA + BB pointwise (equal pol weights),
    # with the shared cell weight counted once
    pdf = cube.toPandas()
    for r in out.limit(20).collect():
        sel = pdf[
            (pdf.subint == r.subint)
            & (pdf.chan == r.chan)
            & (pdf["bin"] == r.bin)
            & (pdf.pol < 2)
        ]
        w = sel.weight.iloc[0]
        assert (sel.weight == w).all()
        if w != 0:
            assert abs(r.value - sel.value.sum()) < 1e-9
            assert abs(r.weight - w) < 1e-12


def test_pscrunch_idempotent_on_single_pol(spark, cube):
    """Already-pscrunched (single-pol) input must pass through unchanged —
    the weight divisor is derived from the data, not a hard-coded 2."""
    once = scrunch(cube, pscrunch=True)
    twice = scrunch(once, pscrunch=True)
    a = {(r.subint, r.chan, r["bin"]): (r.value, r.weight) for r in once.collect()}
    b = {(r.subint, r.chan, r["bin"]): (r.value, r.weight) for r in twice.collect()}
    assert a.keys() == b.keys()
    for k, (v1, w1) in a.items():
        v2, w2 = b[k]
        if v1 is None:
            assert v2 is None
        else:
            assert abs(v1 - v2) < 1e-9
        assert abs(w1 - w2) < 1e-12


@pytest.mark.parametrize(
    "band,nchan,offset,expected",
    [
        ("LBAND", 1024, 0.0, 928),
        ("LBAND", 4096, 0.0, 3712),
        # 16384-mode channel centres sit half a fine channel off the coarse grid
        ("LBAND", 16384, 0.5, 14848),
        ("UHF", 1024, 0.0, 928),
    ],
)
def test_chop_invariants(spark, band, nchan, offset, expected):
    """Exact reference channel counts (tests/test_archive_utils.py:15-34):
    grid freq_i = base + (i+offset)*(bw/nchan), LBAND base 856 MHz, UHF 544."""
    base, bw = (856.0, 856.0) if band == "LBAND" else (544.0, 544.0)
    delta = bw / nchan
    df = spark.createDataFrame(
        [Row(band=band, nchan=nchan, chan=i, freq=base + (i + offset) * delta) for i in range(nchan)]
    )
    kept = chop_edge_channels(df).count()
    assert kept == expected
    assert kept % 32 == 0 or kept == 928


def test_chop_unknown_band_passthrough(spark):
    df = spark.createDataFrame(
        [(None, 64, i, 1000.0 + i) for i in range(64)],
        "band string, nchan int, chan int, freq double",
    )
    assert chop_edge_channels(df).count() == 64


def test_get_band_truth_table(spark):
    cases = [
        ("544.0", 815.5, "UHF"),
        ("544.0", 816.5, None),
        ("775.75", 1283.58, "LBAND"),
        ("999.0", 1283.5, "LBAND"),  # LBAND has no bw predicate in reference
        ("875.0", 2187.5, "SBAND_0"),
        ("875.0", 2406.25, "SBAND_1"),
        ("875.0", 2625.0, "SBAND_2"),
        ("875.0", 2843.75, "SBAND_3"),
        ("875.0", 3062.5, "SBAND_4"),
        ("875.0", 5000.0, None),
    ]
    df = spark.createDataFrame([Row(bw=b, freq_mhz=f, expect=e) for b, f, e in cases])
    bad = df.withColumn("band", get_band()).filter(
        ~(F.col("band").eqNullSafe(F.col("expect")))
    )
    assert bad.count() == 0


def test_calc_max_nsub_matches_reference_formula(spark):
    def ref(sn, nchan, duration, input_nsub, sn_desired=12.0, min_dur=480.0):
        sn_chan = sn / math.sqrt(nchan)
        est = duration * (sn_desired / sn_chan) ** 2
        est = max(est, min_dur)
        return min(input_nsub, math.floor(duration / est))

    cases = [
        (100.0, 16, 3600.0, 32),
        (15.0, 16, 3600.0, 32),
        (12.0, 1, 480.0, 1),
        (200.0, 1024, 255.5, 32),
        (8.0, 16, 7200.0, 64),
    ]
    df = spark.createDataFrame(
        [Row(sn=s, nchan=n, duration=d, input_nsub=i) for s, n, d, i in cases]
    )
    out = df.withColumn(
        "nsub",
        calc_max_nsub(F.col("sn"), F.col("nchan"), F.col("duration"), F.col("input_nsub")),
    ).collect()
    for row, case in zip(out, cases):
        assert row.nsub == ref(*case), f"case {case}"


def test_phase_norm_and_rotate(spark, cube):
    df = spark.createDataFrame([Row(x=-3.2), Row(x=7.5), Row(x=0.0)])
    got = [r.y for r in df.select(phase_norm(F.col("x"), 7.0).alias("y")).collect()]
    assert got == pytest.approx([3.8, 0.5, 0.0])

    rotated = rotate_phase(cube, F.lit(5), F.lit(16))
    # rotation is a bijection on bins: same multiset of bins per profile
    before = sorted(r.bin for r in cube.filter("subint=0 AND pol=0 AND chan=0").collect())
    after = sorted(r.bin for r in rotated.filter("subint=0 AND pol=0 AND chan=0").collect())
    assert before == after
    # value at new_bin (b-5 mod 16) equals value at original b
    orig = {r.bin: r.value for r in cube.filter("subint=0 AND pol=0 AND chan=0").collect()}
    rot = {r.bin: r.value for r in rotated.filter("subint=0 AND pol=0 AND chan=0").collect()}
    for b, v in orig.items():
        assert rot[(b - 5) % 16] == v


def test_cumulative_snr_matches_numpy(spark):
    rng = np.random.default_rng(7)
    ons = rng.uniform(1, 10, 8)
    rmss = rng.uniform(0.5, 2, 8)
    df = spark.createDataFrame(
        [Row(obs_id="o", subint=i, on_sum=float(ons[i]), off_rms=float(rmss[i])) for i in range(8)]
    )
    out = {r.subint: r.cumulative_snr for r in cumulative_snr(df).collect()}
    for k in range(8):
        expect = ons[: k + 1].sum() / np.sqrt((rmss[: k + 1] ** 2).sum())
        assert out[k] == pytest.approx(expect, rel=1e-12)


def test_template_adjust_factor_branches():
    # template 2048 / archive 1024 -> factor 2; non-multiple -> None; equal -> None
    assert template_adjust_factor(2048, 1024) == 2
    assert template_adjust_factor(4096, 1024) == 4
    assert template_adjust_factor(1024, 1024) is None
    assert template_adjust_factor(1000, 1024) is None
    assert template_adjust_factor(1024, 0) is None


def test_concat_archives_reindexes_subints(spark):
    from datetime import datetime

    from meerpipe_spark.operators.scrunch import concat_archives

    def part(ts_s, val):
        return spark.createDataFrame(
            [
                Row(obs_id="o", subint=0, pol=0, chan=c, bin=0,
                    subint_ts=datetime(2020, 1, 1, 0, 0, ts_s), freq=900.0 + c,
                    value=val, weight=1.0)
                for c in range(2)
            ]
        )

    # files arrive out of order: 16s, 0s, 8s
    merged = concat_archives([part(16, 3.0), part(0, 1.0), part(8, 2.0)])
    got = {r.subint: r.value for r in merged.filter("chan = 0").collect()}
    assert got == {0: 1.0, 1: 2.0, 2: 3.0}  # time-ordered ordinals


def test_needs_jones_calibration(spark):
    from meerpipe_spark.operators.polcal import needs_jones_calibration

    df = spark.createDataFrame(
        [
            Row(band="UHF", utc="2021-01-01"),
            Row(band="UHF", utc="2022-01-01"),
            Row(band="LBAND", utc="2020-01-01"),
            Row(band="LBAND", utc="2021-01-01"),
            Row(band="SBAND_0", utc="2019-01-01"),
        ]
    ).withColumn("utc", F.col("utc").cast("timestamp"))
    out = [
        r.nj for r in df.select(
            needs_jones_calibration(F.col("band"), F.col("utc")).alias("nj")
        ).collect()
    ]
    assert out == [True, False, True, False, False]


def test_normalize_profile(spark):
    from meerpipe_spark.operators.snr import normalize_profile

    df = spark.createDataFrame(
        [Row(obs_id="a", bin=i, value=float(v)) for i, v in enumerate([2.0, 4.0, 6.0])]
        + [Row(obs_id="b", bin=i, value=5.0) for i in range(3)]
    )
    out = df.withColumn("norm", normalize_profile(F.col("value"))).collect()
    got = {(r.obs_id, r.bin): r.norm for r in out}
    assert got[("a", 0)] == 0.0 and got[("a", 1)] == 0.5 and got[("a", 2)] == 1.0
    assert all(got[("b", i)] == 0.0 for i in range(3))  # constant profile


def test_pdmp_snr_finds_pulse_window(spark):
    from meerpipe_spark.operators.snr import pdmp_snr

    nbin = 32
    rng = np.random.default_rng(55)
    vals = rng.normal(0, 1, nbin)
    vals[12:20] += 25.0  # pulse in window [12, 20)
    df = spark.createDataFrame(
        [Row(obs_id="o", bin=i, value=float(vals[i])) for i in range(nbin)]
    )
    best = pdmp_snr(df, nbin, widths=(4, 8, 16)).collect()[0]
    # the best window must cover the pulse
    covered = {(best.win_start + k) % nbin for k in range(best.win_width)}
    assert set(range(12, 20)) <= covered or covered <= set(range(12, 20)) or (
        len(covered & set(range(12, 20))) >= 6
    )
    assert best.snr > 10

    # brute-force numpy check: Spark's best snr equals the max over all
    # candidates computed directly
    def snr_of(start, width):
        on_idx = [(start + k) % nbin for k in range(width)]
        off_idx = [i for i in range(nbin) if i not in on_idx]
        on = vals[on_idx]
        off = vals[off_idx]
        return (on.sum() - len(on) * off.mean()) / (off.std() * np.sqrt(len(on)))

    brute = max(snr_of(s, w) for s in range(nbin) for w in (4, 8, 16))
    assert best.snr == pytest.approx(brute, rel=1e-9)


def test_session_window_exact_gap_boundary(spark):
    """ADVICE r5: two events EXACTLY 30 minutes apart. Spark's native
    session_window treats a new event landing exactly at the current
    session end as part of that session (merge on ts - prev <= gap; a
    new session needs a STRICTLY greater gap), so the gaps-and-islands
    oracle must use `> INTERVAL 30 MINUTE` for its new-session mark.
    This pins the convention both implementations must share."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            ("u1", "2024-01-01 00:00:00"),
            ("u1", "2024-01-01 00:30:00"),  # exactly one gap later
            ("u1", "2024-01-01 01:00:01"),  # one second past the gap: new session
        ],
        ["user_id", "ts"],
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"))

    native = (
        df.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user_id", "w.start", "w.end", "n")
        .orderBy("start")
        .collect()
    )
    # exact-gap pair merges (n=2, end = last event + gap); +1s event splits
    assert len(native) == 2
    assert native[0].n == 2
    assert str(native[0].start) == "2024-01-01 00:00:00"
    assert str(native[0].end) == "2024-01-01 01:00:00"
    assert native[1].n == 1

    # gaps-and-islands with the strict `>` mark reproduces it exactly
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts")
    marks = df.select(
        "user_id",
        "ts",
        F.when(
            (F.col("ts").cast("long") - F.lag("ts").over(w).cast("long") > 1800)
            | F.lag("ts").over(w).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    sess = marks.select(
        "user_id", "ts", F.sum("new_s").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)).alias("sid")
    )
    islands = (
        sess.groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("start"),
            (F.max("ts") + F.expr("INTERVAL 30 MINUTE")).alias("end"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("start")
        .collect()
    )
    assert [(r.start, r.end, r.n) for r in islands] == [
        (r.start, r.end, r.n) for r in native
    ]


def test_flux_density_fixed_denominator_under_full_bin_zap(spark):
    """ADVICE r6: an entirely-zapped phase bin must NOT shrink the
    divisor — flux is averaged over the profile's FULL period (psrchive
    mean-flux convention). With bin 7 fully zapped, the all-rows
    distinct count and an explicit nbin=8 must agree, and both must be
    8/7 of what a post-filter distinct count would have produced."""
    from pyspark.sql import Row
    from meerpipe_spark.operators.fluxcal import flux_density

    rows = [
        Row(obs_id="o1", bin=b, value=2.0 if 3 <= b < 5 else 0.0,
            weight=0.0 if b == 7 else 1.0)
        for b in range(8)
    ]
    cube = spark.createDataFrame(rows)
    on_pulse = (F.col("bin") >= 3) & (F.col("bin") < 5)
    implicit = flux_density(cube, on_pulse).collect()[0].flux
    explicit = flux_density(cube, on_pulse, nbin=8).collect()[0].flux
    # on_sum=4, off mean=0 -> flux = 4/8
    assert abs(implicit - 0.5) < 1e-12
    assert abs(explicit - 0.5) < 1e-12


def test_sequence_gap_ranges_no_gaps_and_all_interior(spark, sf_dir):
    """The de-windowed gap query: every reported gap must be interior
    (bounded by surviving ids on both sides), positive-length, and the
    reconstruction surviving+gaps must tile the id range exactly."""
    from meerpipe_spark.queries import QUERIES

    from meerpipe_spark.io import load_tables as _lt

    gaps = QUERIES["sequence_gap_ranges"].fn(spark, sf_dir).collect()
    assert gaps and all(g.gap_len == g.gap_end - g.gap_start + 1 > 0 for g in gaps)
    ev = _lt(spark, sf_dir)["events"]
    present = {
        r.event_id
        for r in ev.filter(
            F.expr("substr(md5(CAST(event_id AS STRING)), 1, 1)") != "7"
        ).select("event_id").collect()
    }
    for g in gaps:
        assert (g.gap_start - 1) in present and (g.gap_end + 1) in present
        assert all(x not in present for x in range(g.gap_start, min(g.gap_end, g.gap_start + 3) + 1))
    # total coverage: surviving ids + gap lengths tile [min, max]
    total = max(present) - min(present) + 1
    assert len(present) + sum(g.gap_len for g in gaps) == total


def test_register_cleanup_runs_at_release(tmp_path):
    """cacheutil.register_cleanup defers side-effect cleanup to the
    tracked-release point: the hook must fire exactly once on
    release_persisted and tolerate hooks that raise."""
    from meerpipe_spark import cacheutil

    hits = []
    p = tmp_path / "scratch"
    p.mkdir()

    def boom():
        raise RuntimeError("cleanup hooks must not break release")

    cacheutil.register_cleanup(boom)
    cacheutil.register_cleanup(lambda: hits.append(1))
    cacheutil.release_persisted()
    assert hits == [1]
    # queue drained: a second release fires nothing
    cacheutil.release_persisted()
    assert hits == [1]


def test_bm25_maxscore_prunes_and_stays_exact(spark, sf_dir):
    """MaxScore: the candidate set SHRINKS (the rare term's postings
    dominate θ, the common terms become non-essential) while the top-k
    equals the naive ranking exactly — lossless pruning, non-vacuous."""
    from meerpipe_spark.io import load_tables
    from meerpipe_spark.operators.text import (
        _bm25_totals,
        bm25_term_scores,
        bm25_topk_maxscore,
    )
    from pyspark.sql import functions as F

    docs = load_tables(spark, sf_dir)["documents"]
    terms = ("dup", "join", "row", "scan")
    result, essential, n_cand, n_all = bm25_topk_maxscore(
        docs, terms, k=10, _introspect=True
    )
    got = [(r.doc_id, r.bm25) for r in result.collect()]
    naive = (
        _bm25_totals(bm25_term_scores(docs, terms))
        .orderBy(F.desc("bm25"), F.col("doc_id"))
        .limit(10)
        .collect()
    )
    want = [(r.doc_id, r.bm25) for r in naive]
    assert got == want
    # non-vacuous on this corpus: at least one term pruned, candidates
    # strictly fewer than all matching docs
    assert len(essential) < len(terms)
    assert n_cand < n_all

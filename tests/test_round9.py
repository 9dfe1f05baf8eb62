"""Round-9 tests: ADVICE fixes (graph id-domain / k_truss guard,
launcher ledger atomicity, stream-offset restart monotonicity) and the
hard-negatives scale path (sampled k-means, join-based IVF assignment,
two-level quantizer)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_deterministic_walks_wide_bigint_ids(spark):
    # ADVICE graph.py:395 — lpad(dst, 12) TRUNCATED ids wider than 12
    # digits, decoding a corrupted node. Pad is now 19 (max bigint).
    big = 10_000_000_000_001  # 14 digits
    edges = spark.createDataFrame(
        [(1, big), (big, 1)], "src BIGINT, dst BIGINT"
    )
    starts = spark.createDataFrame([(7, 1)], "walk_id BIGINT, node BIGINT")
    from meerpipe_spark.operators.graph import deterministic_walks

    path = {r["step"]: r["node"] for r in deterministic_walks(edges, starts, steps=2).collect()}
    assert path[0] == 1
    assert path[1] == big  # the only out-edge; decoded exactly
    assert path[2] == 1


def test_k_truss_rejects_k_below_3(spark):
    # ADVICE graph.py:468 — k<=2 silently computed the 3-truss (zero-
    # triangle edges never appear in the support aggregate); now rejected.
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src BIGINT, dst BIGINT")
    from meerpipe_spark.operators.graph import k_truss

    for bad in (0, 1, 2):
        with pytest.raises(ValueError, match="k >= 3"):
            k_truss(edges, k=bad)
    # k=3 on a triangle still works
    tri = spark.createDataFrame([(1, 2), (1, 3), (2, 3)], "src BIGINT, dst BIGINT")
    got = sorted(map(tuple, k_truss(tri, k=3, rounds=2).collect()))
    assert got == [(1, 2, 1), (1, 3, 1), (2, 3, 1)]


# ---------------------------------------------------------------------------
# Launcher: atomic ledger append + concurrent-launch recovery grace
# ---------------------------------------------------------------------------

def test_ledger_append_is_one_atomic_file_per_batch(spark, sf_dir, tmp_path):
    # ADVICE launcher.py:99 — a plain parquet append publishes multiple
    # task files non-atomically; the ledger batch is now ONE part file
    # os.replace()d into place, so a reader sees it all-or-nothing.
    import os
    from meerpipe_spark.launcher import launch

    out = str(tmp_path / "atomic_out")
    assert launch(spark, sf_dir, out, obs_pid=5, job_limit=12) == 12
    assert launch(spark, sf_dir, out, obs_pid=5, job_limit=12) == 12
    files = sorted(os.listdir(out + "/ledger"))
    data = [f for f in files if not f.startswith(("_", "."))]
    assert len(data) == 2
    assert all(f.startswith("batch-") and f.endswith(".parquet") for f in data)
    # no tmp leftovers after clean commits
    tmp_root = out + "/_ledger_tmp"
    assert not os.path.isdir(tmp_root) or os.listdir(tmp_root) == []
    led = spark.read.parquet(out + "/ledger")
    assert led.count() == 24 and led.select("batch_id").distinct().count() == 2


def test_recover_spares_young_unledgered_staging(spark, sf_dir, tmp_path, monkeypatch):
    # ADVICE launcher.py:111 — a second launch's recovery must NOT
    # rmtree a young unledgered staging dir (it may belong to a
    # concurrent run between staging and its ledger commit).
    import os
    import pytest as _pytest
    import meerpipe_spark.launcher as L

    out = str(tmp_path / "grace_out")

    def boom(selected, ledger_dir, batch_id):
        raise RuntimeError("simulated crash before ledger commit")

    monkeypatch.setattr(L, "_ledger_append", boom)
    with _pytest.raises(RuntimeError, match="simulated crash"):
        L.launch(spark, sf_dir, out, obs_pid=6, job_limit=8)
    monkeypatch.undo()
    orphan = os.listdir(out + "/_staging")
    assert len(orphan) == 1
    # default grace (300 s): the seconds-old orphan SURVIVES the next
    # launch's recovery, and the launch itself is unaffected
    assert L.launch(spark, sf_dir, out, obs_pid=6, job_limit=8) == 8
    assert os.listdir(out + "/_staging") == orphan
    # once stale (grace forced to 0) it is rolled back
    monkeypatch.setattr(L, "RECOVERY_GRACE_SEC", 0.0)
    assert L.launch(spark, sf_dir, out, obs_pid=6, job_limit=8) == 8
    assert all(b not in os.listdir(out + "/_staging") for b in orphan)
    # launch 1 crashed unledgered → launch 2 re-selected the SAME 8
    # (no drop), launch 3 took the next 8: 16 distinct, exactly once
    res = spark.read.parquet(out + "/results")
    assert res.count() == 16
    assert res.select("obs_id").distinct().count() == 16

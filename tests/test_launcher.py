"""The outer query engine (meerpipe_spark/launcher.py): predicate
selection, deterministic throttle, and the CLI's exactly-once re-run
contract (the reference's -unprocessed semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from meerpipe_spark.launcher import (
    launch,
    main,
    observations_from_events,
    select_observations,
)


def test_predicates_and_throttle_deterministic(spark, sf_dir):
    obs = observations_from_events(spark, sf_dir)
    sel = select_observations(
        obs, utc1="2024-01-05 00:00:00", obs_pid=3, job_limit=10
    )
    rows = sel.collect()
    assert len(rows) == 10
    assert all(r.obs_pid == 3 for r in rows)
    # the throttle is the FIRST 10 in (utc_start, obs_id) order — rerun
    # must return the identical set (the submission-order contract)
    again = select_observations(
        obs, utc1="2024-01-05 00:00:00", obs_pid=3, job_limit=10
    ).collect()
    assert sorted(r.obs_id for r in rows) == sorted(r.obs_id for r in again)


def test_psr_and_list_in_crossmatch(spark, sf_dir):
    obs = observations_from_events(spark, sf_dir)
    some_psr = obs.select("psr").first().psr
    wanted = obs.filter(F.col("obs_id") % 5 == 0).select("obs_id")
    sel = select_observations(obs, psr=some_psr, list_in=wanted)
    rows = sel.collect()
    assert rows and all(r.psr == some_psr and r.obs_id % 5 == 0 for r in rows)


def test_launch_is_exactly_once(spark, sf_dir, tmp_path):
    out = str(tmp_path / "launch_out")
    n1 = launch(spark, sf_dir, out, obs_pid=2, job_limit=25)
    assert n1 == 25
    # ledger extended: identical query launches the NEXT 25, then dries up
    n2 = launch(spark, sf_dir, out, obs_pid=2, job_limit=25)
    assert n2 == 25
    first = spark.read.parquet(out + "/ledger").collect()
    assert len({r.obs_id for r in first}) == 50
    # exhaust, then the re-run launches zero
    while launch(spark, sf_dir, out, obs_pid=2, job_limit=5000):
        pass
    assert launch(spark, sf_dir, out, obs_pid=2) == 0
    # results parquet holds every launched observation exactly once
    res = spark.read.parquet(out + "/results")
    assert res.count() == res.select("obs_id").distinct().count()


def test_cli_end_to_end(spark, sf_dir, tmp_path, capsys):
    out = str(tmp_path / "cli_out")
    rc = main(["-obs_pid", "4", "-job_limit", "7", "--sf-dir", sf_dir, "--out-dir", out])
    assert rc == 0
    assert "launched 7 observations" in capsys.readouterr().out
    assert spark.read.parquet(out + "/results").count() == 7


def test_testrun_and_list_out_touch_nothing(spark, sf_dir, tmp_path):
    """The reference's -testrun (report, write nothing) and -list_out
    (persist the selection itself) contracts."""
    out = str(tmp_path / "tr_out")
    lst = str(tmp_path / "sel.parquet")
    n = launch(spark, sf_dir, out, obs_pid=1, job_limit=9,
               testrun=True, list_out=lst)
    assert n == 9
    import os

    assert not os.path.exists(out + "/results")
    assert not os.path.exists(out + "/ledger")
    assert spark.read.parquet(lst).count() == 9
    # a real run afterwards still launches all 9 (testrun left no ledger)
    assert launch(spark, sf_dir, out, obs_pid=1, job_limit=9) == 9


def test_cli_runas_and_single_obs(spark, sf_dir, tmp_path, capsys):
    obs = observations_from_events(spark, sf_dir)
    some = obs.first()
    out = str(tmp_path / "cli2")
    rc = main(["-obs_id", str(some.obs_id), "-runas", "meertime_jitter",
               "--sf-dir", sf_dir, "--out-dir", out])
    assert rc == 0 and "launched 1 observations" in capsys.readouterr().out
    res = spark.read.parquet(out + "/results").collect()
    assert len(res) == 1 and res[0].pipeline == "meertime_jitter"
    assert res[0].obs_id == some.obs_id


def test_crash_between_commit_and_publish_rolls_forward(
    spark, sf_dir, tmp_path, monkeypatch
):
    """VERDICT r7 item 4: kill the process between the ledger append
    (commit point) and the results publication — the re-run completes
    the publication (roll forward) and neither duplicates nor drops."""
    import meerpipe_spark.launcher as L

    out = str(tmp_path / "wal_out")
    real_publish = L._publish_staged

    def boom(staging, results_dir):
        raise RuntimeError("simulated crash after ledger commit")

    monkeypatch.setattr(L, "_publish_staged", boom)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="simulated crash"):
        launch(spark, sf_dir, out, obs_pid=2, job_limit=10)
    # ledger committed, results NOT yet published
    led1 = spark.read.parquet(out + "/ledger")
    assert led1.count() == 10
    import os, glob as g

    assert g.glob(out + "/results/*.parquet") == []
    assert len(os.listdir(out + "/_staging")) == 1
    # re-run with the crash healed: recovery publishes the staged batch,
    # then the run launches the NEXT 10 (ledger already covers the first)
    monkeypatch.setattr(L, "_publish_staged", real_publish)
    n2 = launch(spark, sf_dir, out, obs_pid=2, job_limit=10)
    assert n2 == 10
    res = spark.read.parquet(out + "/results")
    assert res.count() == 20
    assert res.select("obs_id").distinct().count() == 20
    assert os.listdir(out + "/_staging") == []
    # ledger and results agree row-for-row
    led = spark.read.parquet(out + "/ledger")
    assert {r.obs_id for r in led.collect()} == {r.obs_id for r in res.collect()}


def test_crash_before_commit_rolls_back(spark, sf_dir, tmp_path, monkeypatch):
    """A crash BEFORE the ledger append leaves an unledgered staging
    dir: the re-run discards it and re-processes the same observations
    — nothing dropped, nothing duplicated."""
    import meerpipe_spark.launcher as L

    out = str(tmp_path / "wal_out2")

    def boom(selected, ledger_dir, batch_id):
        raise RuntimeError("simulated crash before ledger commit")

    monkeypatch.setattr(L, "_ledger_append", boom)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="simulated crash"):
        launch(spark, sf_dir, out, obs_pid=2, job_limit=10)
    import os, glob as g

    assert not os.path.exists(out + "/ledger")
    assert len(os.listdir(out + "/_staging")) == 1
    monkeypatch.undo()
    # grace 0 = "the crash is old": recovery may roll the orphan back
    monkeypatch.setattr(L, "RECOVERY_GRACE_SEC", 0.0)
    n2 = launch(spark, sf_dir, out, obs_pid=2, job_limit=10)
    assert n2 == 10
    res = spark.read.parquet(out + "/results")
    assert res.count() == 10
    assert res.select("obs_id").distinct().count() == 10
    assert os.listdir(out + "/_staging") == []


def test_launch_executes_pipeline_once(spark, sf_dir, tmp_path):
    """The r7 implementation ran the pipeline twice (count + write).
    Pin single execution: an accumulator inside the pipeline counts the
    rows that actually flow through it — exactly n, not 2n."""
    acc = spark.sparkContext.accumulator(0)

    def execute(df):
        schema = df.schema

        def tap(it):
            for pdf in it:
                acc.add(len(pdf))
                yield pdf

        return df.mapInPandas(tap, schema)

    out = str(tmp_path / "once_out")
    n = launch(spark, sf_dir, out, execute=execute, obs_pid=3, job_limit=40)
    assert n == 40
    assert acc.value == 40


def test_recovery_spares_live_owner_regardless_of_age(
    spark, sf_dir, tmp_path, monkeypatch
):
    """ADVICE r9: mtime-based grace rolled back any concurrent staging
    write slower than the window (Spark touches the staging dir's top
    level only at job start/commit), silently dropping its batch. The
    pid lock is the liveness signal now: an unledgered staging dir
    whose lock pid is ALIVE survives recovery even at grace 0 / mtime
    in the distant past."""
    import os
    import meerpipe_spark.launcher as L

    out = str(tmp_path / "live_out")
    staging = os.path.join(out, "_staging", "slowbatch")
    os.makedirs(staging)
    with open(os.path.join(staging, "part-000.parquet"), "w") as f:
        f.write("x")
    L._acquire_lock(out, "slowbatch")  # our own (live) pid
    os.utime(staging, (0, 0))  # "hours old" by mtime
    monkeypatch.setattr(L, "RECOVERY_GRACE_SEC", 0.0)
    L._recover(spark, out)
    assert os.path.isdir(staging)  # spared: owner alive
    assert os.path.exists(L._lock_path(out, "slowbatch"))


def test_recovery_sweeps_dead_owner_immediately(spark, sf_dir, tmp_path):
    """A lock whose pid is gone proves the owner crashed pre-commit:
    the staging dir is rolled back IMMEDIATELY (no grace wait), and the
    orphan lock goes with it."""
    import os
    import meerpipe_spark.launcher as L

    out = str(tmp_path / "dead_out")
    staging = os.path.join(out, "_staging", "deadbatch")
    os.makedirs(staging)
    lock = L._acquire_lock(out, "deadbatch")
    with open(lock, "w") as f:
        f.write("999999999")  # beyond linux pid_max: provably dead
    # mtime is NOW — the old grace would have spared it; liveness must not
    L._recover(spark, out)
    assert not os.path.exists(staging)
    assert not os.path.exists(lock)


def test_launch_cleans_its_lock(spark, sf_dir, tmp_path):
    import os

    out = str(tmp_path / "lock_out")
    launch(spark, sf_dir, out, obs_pid=2, job_limit=5)
    locks = os.path.join(out, "_locks")
    assert not os.path.isdir(locks) or os.listdir(locks) == []

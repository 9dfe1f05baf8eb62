"""Spark 4 Python DataSource WRITER for the results ledger — the write
side of the custom-source story (`sources/fits_datasource.py` is the
read side).

The reference uploads per-observation results documents to its database
one process at a time (README.md:45-49); here the upload is a real
Spark sink with the two-phase commit protocol the DataSourceWriter API
exposes:

- each TASK writes its rows to a uniquely-named staging file and
  returns a :class:`WriterCommitMessage` naming it;
- the DRIVER, on ``commit()``, atomically publishes every staged file
  (rename into the ledger directory) and appends one manifest line —
  a half-written task can never surface, because ``abort()`` deletes
  the staged files instead;
- the STREAMING variant stamps the ``batchId`` into the manifest, so a
  replayed micro-batch (same batchId after failure) is detected and
  skipped — exactly-once on top of at-least-once delivery, the same
  ledger discipline ``streaming/events.run_incremental_pipeline``
  implements with foreachBatch, now at the sink API layer.

Rows are written as ndjson (one results document per line — the
reference's document shape), so the ledger is greppable and replayable
by any tool.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


class _Staged(WriterCommitMessage):
    def __init__(self, path: str, rows: int):
        self.path = path
        self.rows = rows


def _write_rows(staging_dir: str, iterator) -> _Staged:
    os.makedirs(staging_dir, exist_ok=True)
    path = os.path.join(staging_dir, f"task-{uuid.uuid4().hex}.ndjson")
    n = 0
    with open(path, "w") as fh:
        for row in iterator:
            fh.write(json.dumps(row.asDict(), default=str, sort_keys=True) + "\n")
            n += 1
    return _Staged(path, n)


class LedgerWriter(DataSourceWriter):
    def __init__(self, options):
        self.out_dir = options.get("path")

    def write(self, iterator) -> _Staged:
        return _write_rows(os.path.join(self.out_dir, "_staging"), iterator)

    def commit(self, messages) -> None:
        _publish(self.out_dir, messages, batch_id=None)

    def abort(self, messages) -> None:
        _discard(messages)


class LedgerStreamWriter(DataSourceStreamWriter):
    def __init__(self, options):
        self.out_dir = options.get("path")

    def write(self, iterator) -> _Staged:
        return _write_rows(os.path.join(self.out_dir, "_staging"), iterator)

    def commit(self, messages, batchId: int) -> None:  # noqa: N803 (API name)
        entry = _batch_entry(self.out_dir, batchId)
        if entry is not None:
            # replayed micro-batch: the manifest (sole commit point)
            # already records it. Finish any renames a crash interrupted
            # (roll forward), then drop the redelivered staging files.
            _roll_forward(self.out_dir, entry)
            _discard(messages)
            return
        _publish(self.out_dir, messages, batch_id=batchId)

    def abort(self, messages, batchId: int) -> None:  # noqa: N803
        _discard(messages)


def _manifest(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest.ndjson")


def _manifest_entries(out_dir: str):
    """Parse manifest lines, tolerating a torn final line (a crash mid-
    append): unparseable lines are treated as never written — safe,
    because the manifest is the commit point and an unreadable line is
    an uncommitted batch."""
    try:
        with open(_manifest(out_dir)) as fh:
            for line in fh:
                try:
                    yield json.loads(line)
                except json.JSONDecodeError:
                    continue
    except FileNotFoundError:
        return


def _batch_entry(out_dir: str, batch_id: int):
    for e in _manifest_entries(out_dir):
        if e.get("batch_id") == batch_id:
            return e
    return None


def _roll_forward(out_dir: str, entry) -> None:
    """Complete a crash-interrupted publication: every file the manifest
    entry names must end up in out_dir; any still sitting in _staging is
    renamed now. Idempotent."""
    staging_dir = os.path.join(out_dir, "_staging")
    for f in entry.get("files", []):
        final = os.path.join(out_dir, f["file"])
        staged = os.path.join(staging_dir, f["file"])
        if not os.path.exists(final) and os.path.exists(staged):
            os.replace(staged, final)


def _publish(out_dir: str, messages, batch_id) -> None:
    """Manifest-FIRST two-phase commit (ADVICE r7): the manifest append
    is the sole commit point — it names the batch's files BEFORE any
    rename, so a crash at any point is recoverable: before the append,
    nothing is committed (staging is discarded on replay/abort); after
    it, the renames are rolled forward by the next commit of the same
    batch or by resolve_manifest(). Readers must resolve data files via
    the manifest (resolve_manifest), never by globbing *.ndjson — a
    glob can see files whose batch was never committed only in the
    legacy rename-first layout; in this layout it can MISS files not
    yet rolled forward."""
    os.makedirs(out_dir, exist_ok=True)
    keep = []
    for m in messages:
        if m is None or m.rows == 0:
            if m is not None:
                os.unlink(m.path)
            continue
        keep.append(m)
    entry = {
        "batch_id": batch_id,
        "files": [
            {"file": os.path.basename(m.path), "rows": m.rows} for m in keep
        ],
    }
    # COMMIT POINT: one line, flushed before any data file moves
    with open(_manifest(out_dir), "a") as fh:
        fh.write(json.dumps(entry, sort_keys=True) + "\n")
        fh.flush()
        os.fsync(fh.fileno())
    for m in keep:
        final = os.path.join(out_dir, os.path.basename(m.path))
        if not os.path.exists(final):
            os.replace(m.path, final)  # atomic on one filesystem


def resolve_manifest(out_dir: str, as_of_batch: "int | None" = None) -> "list[str]":
    """The reader contract: the committed data files, in commit order,
    rolling forward any rename a crash interrupted. Use this (not a
    glob) to read the ledger.

    ``as_of_batch`` gives time travel over the streaming ledger: only
    files whose manifest entry has batch_id ≤ as_of_batch are returned
    — the ledger exactly as a reader would have seen it after that
    micro-batch committed. The manifest is append-only, so every
    historical snapshot stays addressable for free."""
    paths = []
    for entry in _manifest_entries(out_dir):
        bid = entry.get("batch_id")
        if as_of_batch is not None and (bid is None or bid > as_of_batch):
            continue
        _roll_forward(out_dir, entry)
        for f in entry.get("files", []):
            paths.append(os.path.join(out_dir, f["file"]))
    return paths


def read_ledger(spark, out_dir: str, as_of_batch: "int | None" = None):
    """Manifest-resolved ledger read as a DataFrame (ndjson lines), with
    optional batch-level time travel. Empty snapshot → empty frame with
    no rows and no columns (the caller sees 0 rows, not an error)."""
    paths = resolve_manifest(out_dir, as_of_batch)
    if not paths:
        return spark.createDataFrame([], "struct<>")
    return spark.read.json(paths)


def _discard(messages) -> None:
    for m in messages:
        if m is not None:
            try:
                os.unlink(m.path)
            except FileNotFoundError:
                pass


class ResultsLedgerDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "results_ledger"

    def writer(self, schema, overwrite: bool) -> LedgerWriter:
        return LedgerWriter(self.options)

    def streamWriter(self, schema, overwrite: bool) -> LedgerStreamWriter:
        return LedgerStreamWriter(self.options)

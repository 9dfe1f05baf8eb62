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
        if _batch_committed(self.out_dir, batchId):
            _discard(messages)  # replayed micro-batch: exactly-once skip
            return
        _publish(self.out_dir, messages, batch_id=batchId)

    def abort(self, messages, batchId: int) -> None:  # noqa: N803
        _discard(messages)


def _manifest(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest.ndjson")


def _batch_committed(out_dir: str, batch_id: int) -> bool:
    try:
        with open(_manifest(out_dir)) as fh:
            return any(
                json.loads(line).get("batch_id") == batch_id for line in fh
            )
    except FileNotFoundError:
        return False


def _publish(out_dir: str, messages, batch_id) -> None:
    os.makedirs(out_dir, exist_ok=True)
    published = []
    for m in messages:
        if m is None or m.rows == 0:
            if m is not None:
                os.unlink(m.path)
            continue
        final = os.path.join(out_dir, os.path.basename(m.path))
        os.replace(m.path, final)  # atomic on one filesystem
        published.append({"file": os.path.basename(final), "rows": m.rows})
    with open(_manifest(out_dir), "a") as fh:
        fh.write(
            json.dumps({"batch_id": batch_id, "files": published}, sort_keys=True)
            + "\n"
        )


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

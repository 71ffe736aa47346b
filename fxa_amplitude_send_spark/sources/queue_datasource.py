"""Custom Python DataSource (Spark 4 API): a durable payload queue.

The reference's ingestion is a synchronous, rate-capped pull from a durable
queue (`synchronous-pull.js:24-34,44-52`: at most MAX_EVENTS_PER_BATCH
messages per pull, ack after send). This module expresses that contract as
a first-class Spark source instead of an adapter around the file source:

    spark.dataSource.register(PayloadQueueDataSource)
    spark.read.format("payload_queue").option("path", dir).load()
    spark.readStream.format("payload_queue")
         .option("path", dir)
         .option("maxEventsPerBatch", "500").load()

Schema: (offset long, payload string) over a directory of JSONL files —
offset is the stable global position (files in sorted order, rows in file
order), the analogue of the queue's ack cursor. The stream reader advances
its offset by at most maxEventsPerBatch per micro-batch (MAX_EVENTS_PER_
BATCH parity) and replays any uncommitted range on restart — at-least-once
delivery, exactly the reference's semantics, with the downstream insert_id
dedup (operators/event_pipeline.py) making the sink idempotent.

Scale notes: one input partition per file for batch reads (scan
parallelism = file count, as for any file-based source); the streaming
path partitions each micro-batch range by file so executors read only
their slice. Listing is driver-side and O(files) per trigger — a real
queue (Kafka) replaces listing with broker metadata, and the engine's
QueueSource adapter (streaming/pipeline.py) already speaks that dialect;
this source exists so the *queue contract itself* is testable in-repo.

Executor-pickling discipline: reader objects are serialized to worker
Python processes — methods use only stdlib (os, json), never repo-module
globals.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)


def _list_files(path: str) -> list[str]:
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith((".json", ".jsonl")) and not f.startswith((".", "_"))
    )


def _file_rows(fp: str) -> list[str]:
    with open(fp, "r", encoding="utf-8") as fh:
        return [line.rstrip("\n") for line in fh if line.strip()]


class _FilePartition(InputPartition):
    def __init__(self, fp: str, base: int, lo: int, hi: int):
        self.fp = fp
        self.base = base  # global offset of this file's row 0
        self.lo = lo  # first in-file row index to emit
        self.hi = hi  # one past the last in-file row index


class _QueueBatchReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("payload_queue requires option 'path'")

    def partitions(self):
        parts, base = [], 0
        for fp in _list_files(self.path):
            n = len(_file_rows(fp))
            parts.append(_FilePartition(fp, base, 0, n))
            base += n
        return parts or [_FilePartition("", 0, 0, 0)]

    def read(self, partition):
        if not partition.fp:
            return
        rows = _file_rows(partition.fp)
        for i in range(partition.lo, partition.hi):
            yield (partition.base + i, rows[i])


class _QueueStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("payload_queue requires option 'path'")
        self.cap = int(options.get("maxEventsPerBatch", "1000"))

    def _snapshot(self):
        """(files, total_rows) at this instant — the queue's visible end."""
        files = []
        base = 0
        for fp in _list_files(self.path):
            n = len(_file_rows(fp))
            files.append((fp, base, n))
            base += n
        return files, base

    def initialOffset(self):
        self._cursor = 0
        return {"row": 0}

    def latestOffset(self):
        # Advance the pull cursor by at most `cap` rows per micro-batch:
        # the engine-side MAX_EVENTS_PER_BATCH (synchronous-pull.js:33) /
        # Kafka maxOffsetsPerTrigger analogue. The reader owns the cursor
        # (the API passes no start offset here); partitions()/commit()
        # re-sync it to Spark's checkpointed offsets, so after a restart
        # the first latestOffset() never regresses behind the offset log —
        # only the uncommitted tail replays (at-least-once, like the
        # reference's ack-after-send). The max() keeps the returned offset
        # monotonic even if queue files vanish underneath us.
        _, total = self._snapshot()
        cur = getattr(self, "_cursor", 0)
        self._cursor = max(cur, min(total, cur + self.cap))
        return {"row": self._cursor}

    def partitions(self, start, end):
        lo, hi = start["row"], end["row"]
        # Re-sync the in-memory pull cursor from Spark-provided offsets:
        # after a restart this instance is fresh (cursor 0) but `end` comes
        # from the checkpointed offset log — never hand out offsets behind
        # what the log already covers.
        self._cursor = max(getattr(self, "_cursor", 0), hi)
        files, _ = self._snapshot()
        parts = []
        for fp, base, n in files:
            # intersect [lo, hi) with this file's [base, base+n)
            a, b = max(lo, base), min(hi, base + n)
            if a < b:
                parts.append(_FilePartition(fp, base, a - base, b - base))
        return parts or [_FilePartition("", 0, 0, 0)]

    def read(self, partition):
        if not partition.fp:
            return
        rows = _file_rows(partition.fp)
        for i in range(partition.lo, partition.hi):
            yield (partition.base + i, rows[i])

    def commit(self, end):
        # ack point (synchronous-pull.js:88-92); never move the pull cursor
        # backwards past data already handed out
        self._cursor = max(getattr(self, "_cursor", 0), end["row"])

    def stop(self):
        pass


class PayloadQueueDataSource(DataSource):
    """format("payload_queue"): batch + rate-capped streaming payload reads."""

    @classmethod
    def name(cls):
        return "payload_queue"

    def schema(self):
        return "offset long, payload string"

    def reader(self, schema):
        return _QueueBatchReader(self.options)

    def streamReader(self, schema):
        return _QueueStreamReader(self.options)

    def writer(self, schema, overwrite):
        return _QueueBatchWriter(self.options)

    def streamWriter(self, schema, overwrite):
        return _QueueStreamWriter(self.options)


# ---------------------------------------------------------------------------
# write path: the queue as a SINK (batch + streaming) with a commit protocol
# ---------------------------------------------------------------------------

from dataclasses import dataclass  # noqa: E402

from pyspark.sql.datasource import (  # noqa: E402
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class _QueueCommit(WriterCommitMessage):
    staged: str  # staged file path, promoted to the queue dir on commit


def _stage_rows(path: str, iterator, suffix: str) -> "_QueueCommit":
    """Task-side: write this partition's rows to a staging file. Uses only
    stdlib (executor pickling discipline); rows are (payload string) or
    (offset, payload) — the payload column is written one JSON line each."""
    import os
    import uuid

    staging_dir = os.path.join(path, "_staging")
    os.makedirs(staging_dir, exist_ok=True)
    staged = os.path.join(staging_dir, f"{uuid.uuid4().hex}{suffix}")
    n = 0
    with open(staged, "w", encoding="utf-8") as fh:
        for row in iterator:
            payload = row["payload"] if "payload" in row.__fields__ else row[0]
            fh.write(str(payload) + "\n")
            n += 1
    if n == 0:
        os.remove(staged)
        return _QueueCommit(staged="")
    return _QueueCommit(staged=staged)


def _next_seq(path: str) -> int:
    """Max sequence number among already-promoted queue files, plus one.
    All writers (batch and streaming) share one zero-padded numeric prefix
    so the sorted listing — which IS the reader's offset space — is
    append-only: a new commit's files always sort after every existing
    file, never in between."""
    import os
    import re

    seq = 0
    try:
        names = os.listdir(path)
    except FileNotFoundError:
        return 1
    for f in names:
        m = re.match(r"payloads-(\d{10})-", f)
        if m:
            seq = max(seq, int(m.group(1)))
    return seq + 1


def _promote(path: str, messages, batch_tag: str) -> None:
    """Driver-side commit: rename staged files into the queue directory.
    Rename is atomic per file; readers only list *.jsonl in the queue root,
    so uncommitted/aborted staging files are never visible — the sink-side
    analogue of the reference's ack-after-send (synchronous-pull.js:88-92).

    Final names are ``payloads-<seq>-<tag>-<i>.jsonl`` where <seq> is a
    zero-padded commit sequence unique per commit: repeated batch writes
    (or two streams sharing the dir with equal batchIds) can never rename
    onto an existing committed file, and the lexicographic listing stays
    append-only so already-handed-out stream offsets never shift. A
    destination that somehow exists is skipped forward, never overwritten."""
    import os

    seq = _next_seq(path)
    for i, m in enumerate(m for m in messages if m and m.staged):
        while True:
            final = os.path.join(
                path, f"payloads-{seq:010d}-{batch_tag}-{i:05d}.jsonl"
            )
            if not os.path.exists(final):
                break
            seq += 1  # concurrent committer won the name: move past it
        os.rename(m.staged, final)


def _abort(messages) -> None:
    import os

    for m in messages or []:
        if m and m.staged and os.path.exists(m.staged):
            os.remove(m.staged)


class _QueueBatchWriter(DataSourceWriter):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("payload_queue requires option 'path'")

    def write(self, iterator):
        return _stage_rows(self.path, iterator, ".jsonl.part")

    def commit(self, messages):
        _promote(self.path, messages, "batch")

    def abort(self, messages):
        _abort(messages)


class _QueueStreamWriter(DataSourceStreamWriter):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("payload_queue requires option 'path'")

    def write(self, iterator):
        return _stage_rows(self.path, iterator, ".jsonl.part")

    def commit(self, messages, batchId):
        _promote(self.path, messages, f"b{batchId:09d}")

    def abort(self, messages, batchId):
        _abort(messages)

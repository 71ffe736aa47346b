"""Amplitude-style HTTP batch sink with chunking + bounded retry.

Reference semantics (utils.js:92-103, synchronous-pull.js:74-86):

* POST ``{api_key, events}`` as JSON to the /batch endpoint, 5 s timeout.
* ≤ MAX_EVENTS_PER_BATCH events per request (synchronous-pull.js:33 — the
  pull size doubles as the POST size; here partitions are chunked).
* bounded retry, MAX_RETRIES (default 3); the reference retries EVERY
  failure including 4xx (it never calls bail). Engine default retries only
  408/429/5xx/network errors — documented divergence (SURVEY.md §2A),
  restorable with ``retry_all_errors=True``.
* on exhaustion the error propagates: in streaming the micro-batch fails and
  Structured Streaming replays from the checkpoint — the same at-least-once
  contract as the reference's break-and-redeliver (synchronous-pull.js:83-85).

Executor discipline: the partition function is fully self-contained (stdlib
only, config captured as plain primitives) so cloudpickle ships it by value —
executors never import this package.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

from pyspark.sql import DataFrame

from ..config import PipelineConfig

#: HTTP statuses worth retrying when retry_all_errors is False.
RETRYABLE_STATUSES = frozenset({408, 429, 500, 502, 503, 504})


def send_events_http(
    events: list[dict],
    endpoint: str,
    api_key: str,
    timeout_seconds: float = 5.0,
    max_retries: int = 3,
    retry_all_errors: bool = False,
    backoff_seconds: float = 0.2,
) -> int:
    """POST one chunk with bounded retry; returns the attempt count.

    Raises the final error after ``max_retries`` retries are exhausted
    (i.e. at most max_retries + 1 attempts, matching async-retry's contract).
    Pure stdlib (urllib) — usable verbatim inside executors.
    """
    import time
    import urllib.error
    import urllib.request

    body = json.dumps({"api_key": api_key, "events": events}).encode("utf-8")
    attempts = 0
    while True:
        attempts += 1
        try:
            req = urllib.request.Request(
                endpoint,
                data=body,
                headers={"Content-Type": "application/json"},
                method="POST",
            )
            with urllib.request.urlopen(req, timeout=timeout_seconds):
                return attempts
        except urllib.error.HTTPError as exc:
            retryable = retry_all_errors or exc.code in RETRYABLE_STATUSES
            if not retryable or attempts > max_retries:
                raise
        except (urllib.error.URLError, TimeoutError, OSError):
            if attempts > max_retries:
                raise
        time.sleep(backoff_seconds * attempts)


def http_batch_sink(df: DataFrame, config: PipelineConfig) -> None:
    """Send every row of ``df`` to the HTTP endpoint, chunked per partition.

    Each executor partition: rows → dicts (null-stripped, like JSON.stringify
    dropping undefined) → chunks of ``max_events_per_batch`` → POST with
    retry. Connection reuse comes from urllib's keep-alive per opener within
    the partition loop; parallelism = partition count.
    """
    cfg = {
        "endpoint": config.endpoint,
        "api_key": config.amplitude_api_key,
        "chunk": config.max_events_per_batch,
        "timeout": config.timeout_seconds,
        "retries": config.max_retries,
        "retry_all": config.retry_all_errors,
    }
    send = send_events_http  # bind by value into the closure

    def send_partition(rows: Iterator) -> None:
        chunk: list[dict] = []
        for row in rows:
            event = {k: v for k, v in row.asDict(recursive=True).items() if v is not None}
            chunk.append(event)
            if len(chunk) >= cfg["chunk"]:
                send(
                    chunk,
                    cfg["endpoint"],
                    cfg["api_key"],
                    cfg["timeout"],
                    cfg["retries"],
                    cfg["retry_all"],
                )
                chunk = []
        if chunk:
            send(
                chunk,
                cfg["endpoint"],
                cfg["api_key"],
                cfg["timeout"],
                cfg["retries"],
                cfg["retry_all"],
            )

    df.foreachPartition(send_partition)

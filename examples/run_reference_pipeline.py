"""End-to-end demo: the reference pipeline, Spark-first.

What the reference does with a Node poll loop (synchronous-pull.js), run here
as one engine invocation: synthesize Pub/Sub-style payloads → parse/validate/
repair/pseudonymize/fan-out → dedup on insert_id → write curated parquet AND
post batches to an HTTP sink (a local capture server here — point
``--endpoint`` at a real collector to ship events for real).

    python examples/run_reference_pipeline.py [--sf-dir /root/testdata/sf0.001]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    parser.add_argument("--endpoint", default=None, help="HTTP sink URL (default: local capture server)")
    parser.add_argument("--out", default=os.path.join(tempfile.gettempdir(), "fxa_pipeline_out"))
    args = parser.parse_args()

    from fxa_amplitude_send_spark.config import PipelineConfig
    from fxa_amplitude_send_spark.plans.flagship import FLAGSHIP_HMAC_KEY, staged_payloads
    from fxa_amplitude_send_spark.operators.event_pipeline import event_pipeline
    from fxa_amplitude_send_spark.session import build_session
    from fxa_amplitude_send_spark.sinks.http_batch import http_batch_sink

    server = None
    endpoint = args.endpoint
    if endpoint is None:
        # local capture server so the demo is self-contained
        from tests.test_streaming_and_sink import RecordingServer

        server = RecordingServer()
        endpoint = server.endpoint

    spark = build_session("fxa-pipeline-demo")
    spark.sparkContext.setLogLevel("ERROR")

    config = PipelineConfig(
        amplitude_api_key="demo-api-key",
        hmac_key=FLAGSHIP_HMAC_KEY,
        max_events_per_batch=500,
        endpoint=endpoint,
    )

    from pyspark.sql import functions as F

    payloads = staged_payloads(spark, args.sf_dir)
    events = event_pipeline(payloads, config.hmac_key)
    # dedup applies to httpapi events only — $identify rows carry no
    # insert_id (utils.js:78-83) and must all pass through
    httpapi = events.filter(F.col("insert_id").isNotNull()).dropDuplicates(
        ["insert_id"]
    )
    identifies = events.filter(F.col("insert_id").isNull())
    deduped = identifies.unionByName(httpapi)

    n_in = payloads.count()
    n_out = deduped.count()

    deduped.write.mode("overwrite").parquet(args.out)
    http_batch_sink(
        deduped.select(
            "device_id", "user_id", "event_type", "time", "session_id", "insert_id"
        ),
        config,
    )

    posted = sum(len(b["events"]) for b in server.bodies) if server else "n/a"
    print(
        json.dumps(
            {
                "type": "events.processed",  # synchronous-pull.js:94-101 parity
                "inputCount": n_in,
                "outputCount": n_out,
                "parquet_out": args.out,
                "http_posted": posted,
                "http_batches": len(server.bodies) if server else "n/a",
            }
        )
    )
    if server:
        server.close()


if __name__ == "__main__":
    main()

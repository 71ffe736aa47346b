"""fxa_amplitude_send_spark — a PySpark-native analytics engine with the
event-processing capabilities of mozilla/fxa-amplitude-send, generalized to a
full relational + LLM-data-pipeline operator surface.

Reference behavior studied from /root/reference (synchronous-pull.js, utils.js);
all implementations here are original, Spark-first designs: declarative
DataFrame plans optimized by Catalyst, Pandas UDFs only where the built-ins
genuinely can't express the semantics (HMAC-SHA256 pseudonymization).

Layout:
    session.py    SparkSession builder with scale-aware defaults
    config.py     pipeline configuration (reference: synchronous-pull.js:15-21)
    sources/      table + raw-event readers (batch and streaming)
    functions/    column-level functions (hashing, json, text, vectors)
    operators/    composite operators (event pipeline, dedup, similarity, ...)
    plans/        named query builders registered for the driver contract
    sinks/        HTTP batch sink with retry policy (reference: utils.js:92-103)
    streaming/    Structured Streaming wrappers (micro-batch = ref poll loop)
"""

__version__ = "0.1.0"

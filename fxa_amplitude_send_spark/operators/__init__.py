from .event_pipeline import (
    IDENTIFY_VERBS,
    decode_pubsub,
    event_pipeline,
    identify_fanout,
    parse_envelope,
    pseudonymize,
    validity_predicate,
    with_insert_id,
)

__all__ = [
    "IDENTIFY_VERBS",
    "decode_pubsub",
    "event_pipeline",
    "identify_fanout",
    "parse_envelope",
    "pseudonymize",
    "validity_predicate",
    "with_insert_id",
]

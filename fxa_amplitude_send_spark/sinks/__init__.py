from .http_batch import http_batch_sink, send_events_http

__all__ = ["http_batch_sink", "send_events_http"]

"""Sink connectors (reference SURVEY §2.7)."""

from .chunked import ChunkedSink, ChunkedSinkConfig, LocalDirClient, SinkClient, SinkReport  # noqa: F401

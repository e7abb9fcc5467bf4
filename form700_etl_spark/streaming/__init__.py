"""Structured Streaming operators over the events table (M5)."""

from .events_stream import (  # noqa: F401
    read_events_stream,
    run_to_completion,
    stream_dedup_events,
    stream_session_windows,
    stream_tumbling_counts,
)

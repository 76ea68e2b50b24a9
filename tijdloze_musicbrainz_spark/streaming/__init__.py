"""Structured Streaming twins of the batch event plans."""

from .jobs import (  # noqa: F401
    run_stream_to_memory,
    sessionize_stream,
    stream_events,
    windowed_counts,
)

"""Structured Streaming pipeline + pluggable foreachBatch sinks
(SURVEY.md §2.2, §2.9)."""

from . import pipeline, sinks, stateful  # noqa: F401

"""Structured Streaming surface (engine extension — the reference has no
streaming abstractions, SURVEY.md §1.5)."""

from h2h_spark.streaming.windows import run_windowed_counts, sessionize

__all__ = ["run_windowed_counts", "sessionize"]

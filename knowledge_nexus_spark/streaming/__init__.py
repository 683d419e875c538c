"""Structured Streaming: incremental corpus ingest (SURVEY.md §4.4)."""

"""Snapshot checkpoints and merge-style sinks (SURVEY.md §4.4)."""

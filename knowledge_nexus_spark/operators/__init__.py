"""Composed DataFrame operators (SURVEY.md §2.3-2.6)."""

"""Batch & streaming sources/sinks (SURVEY.md §2D)."""

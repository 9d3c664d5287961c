"""Structured Streaming ingestion (SURVEY.md §2D)."""

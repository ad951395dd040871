"""Structured Streaming skin over the batch round engine (SURVEY.md §7.6)."""

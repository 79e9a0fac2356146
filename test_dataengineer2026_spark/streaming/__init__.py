"""Structured Streaming surface (SURVEY.md §2.10 M1-M9)."""

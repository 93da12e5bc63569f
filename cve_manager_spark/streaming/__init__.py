"""Structured Streaming wrappers (SURVEY §2.7)."""

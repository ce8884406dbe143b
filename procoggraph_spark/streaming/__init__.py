"""Structured Streaming surface (beyond the all-batch reference,
SURVEY §2.10)."""

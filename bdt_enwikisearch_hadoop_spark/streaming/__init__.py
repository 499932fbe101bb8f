"""Streaming-shaped queries (§2.K) and true Structured Streaming smokes."""

"""Structured Streaming wiring for the CDC north-star pipeline."""

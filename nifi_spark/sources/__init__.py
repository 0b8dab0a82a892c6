"""Batch/incremental sources beyond the streaming file feed."""

"""Sinks: the snapshot/commit-log lake table and format writers."""

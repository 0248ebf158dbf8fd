"""Utilities: profiling/tracing hooks."""
